

def test_reference_function_list_fully_covered():
    """Every function shipped by the reference's ottlfuncs package (the
    func_*.go inventory at pkg/ottl/ottlfuncs/) resolves here — either in
    the OTTL function registry or as a compiler statement editor."""
    import opentelemetry_collector_contrib_spark.functions.ottl as ottl_mod
    import opentelemetry_collector_contrib_spark.functions.ottl_compiler as comp_mod

    reg = set(ottl_mod.OTTL_FUNCTIONS)
    comp_src = open(comp_mod.__file__).read()
    ref = """all any append base64decode base64encode bool coalesce community_id
        concat contains_value convert_attributes_to_elements_xml convert_case
        convert_text_to_elements_xml day decode delete_index delete_key
        delete_matching_keys double duration extract_grok_patterns
        extract_patterns filter find flatten fnv format formattime get_xml
        has_prefix has_suffix hex hour hours index insert_xml int is_bool
        is_double is_empty is_in_cidr is_int is_list is_map is_match
        is_root_span is_string is_valid_luhn keep_keys keep_matching_keys keys
        len limit log map_each map_keys md5 merge_maps microseconds
        milliseconds minute minutes month murmur3_hash murmur3_hash128
        nanosecond nanoseconds now parse_csv parse_int parse_json
        parse_key_value parse_severity parse_simplified_xml parse_xml
        profile_id reduce remove_xml replace_all_matches replace_all_patterns
        replace_match replace_pattern second seconds set slice_to_map sort
        span_id split string stringify_all substring time to_camel_case
        to_key_value_string to_lower_case to_snake_case to_upper_case trace_id
        trim trim_prefix trim_suffix truncate_all truncate_time unix
        unix_micro unix_milli unix_nano unix_seconds url useragent uuid uuidv7
        values weekday when xxh128 xxh3 year""".split()
    aliases = {
        "base64decode": "Base64Decode", "base64encode": "Base64Encode",
        "extract_grok_patterns": "ExtractGrokPatterns", "formattime": "FormatTime",
        "md5": "MD5", "parse_csv": "ParseCSV", "parse_json": "ParseJSON",
        "parse_int": "ParseInt", "parse_key_value": "ParseKeyValue",
        "parse_severity": "ParseSeverity", "parse_simplified_xml": "ParseSimplifiedXML",
        "parse_xml": "ParseXML", "sha1": "SHA1", "sha256": "SHA256",
        "sha512": "SHA512", "url": "URL", "useragent": "UserAgent",
        "uuid": "UUID", "uuidv7": "UUIDv7", "xxh128": "XXH128", "xxh3": "XXH3",
        "is_in_cidr": "IsInCIDR", "community_id": "CommunityID",
        "fnv": "FNV", "span_id": "SpanID", "trace_id": "TraceID", "profile_id": "ProfileID", "convert_attributes_to_elements_xml": "ConvertAttributesToElementsXML",
        "convert_text_to_elements_xml": "ConvertTextToElementsXML",
        "get_xml": "GetXML", "insert_xml": "InsertXML", "remove_xml": "RemoveXML",
        "to_key_value_string": "ToKeyValueString",
    }
    # statement-level editors live in the compiler grammar, not the registry
    compiler_level = {"keep_keys", "set", "delete_key", "limit"}
    missing = []
    for name in ref:
        cand = aliases.get(name, "".join(w.capitalize() for w in name.split("_")))
        if cand in reg:
            continue
        if name in compiler_level and name in comp_src:
            continue
        missing.append(name)
    assert not missing, missing
