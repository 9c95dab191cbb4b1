"""Property tests for the SIEM parsers' pure-python kernels — totality on
arbitrary input (never raise, shape stable) and render∘parse identity over
the escapable alphabets. These run WITHOUT Spark (the kernels are what the
pandas UDFs map), so hypothesis can afford thousands of cases."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_spark.operators.logformats import (
    _clf_unescape,
    _parse_cef_line,
    _parse_leef_line,
)

any_text = st.text(max_size=120)


@given(any_text)
@settings(max_examples=2000)
def test_cef_parser_total(s):
    out = _parse_cef_line(s)
    assert out is None or (
        len(out) == 8
        and all(isinstance(x, str) for x in out[:7])
        and isinstance(out[7], dict)
    )


@given(any_text)
@settings(max_examples=2000)
def test_leef_parser_total(s):
    out = _parse_leef_line(s)
    assert out is None or (
        len(out) == 6
        and all(isinstance(x, str) for x in out[:5])
        and isinstance(out[5], dict)
    )


@given(any_text)
@settings(max_examples=2000)
def test_clf_unescape_total(s):
    r = _clf_unescape(s)
    assert isinstance(r, str)


# --- render -> parse identities ---------------------------------------------

def _esc_cef_header(s: str) -> str:
    return s.replace("\\", "\\\\").replace("|", "\\|")


def _esc_cef_value(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace("=", "\\=").replace("\n", "\\n").replace("\r", "\\r")
    )


header_field = st.text(
    alphabet=st.characters(blacklist_characters="\n\r", min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=20,
)
ext_key = st.text(alphabet="abcdefghXYZ_0123456789", min_size=1, max_size=10)
# extension values: anything printable + the escapable classes; no trailing
# spaces (the reference right-trims them — a documented lossy case)
ext_value = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126) | st.sampled_from("\n\r"),
    min_size=0, max_size=24,
).map(lambda s: s.rstrip(" "))


@given(
    vendor=header_field, product=header_field, name=header_field,
    exts=st.dictionaries(ext_key, ext_value, min_size=0, max_size=4),
)
@settings(max_examples=400)
def test_cef_render_parse_identity(vendor, product, name, exts):
    line = "CEF:0|{}|{}|1.0|id|{}|5".format(
        _esc_cef_header(vendor), _esc_cef_header(product), _esc_cef_header(name)
    )
    if exts:
        line += "|" + " ".join(f"{k}={_esc_cef_value(v)}" for k, v in exts.items())
    out = _parse_cef_line(line)
    assert out is not None
    assert out[1] == vendor and out[2] == product and out[5] == name
    assert out[7] == exts


leef_value = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, blacklist_characters="\x1d"),
    min_size=0, max_size=24,
)


@given(attrs=st.dictionaries(ext_key, leef_value, min_size=0, max_size=4))
@settings(max_examples=400)
def test_leef_render_parse_identity(attrs):
    # delimiter 0x1d (group separator) can't appear in the value alphabet
    line = "LEEF:2.0|V|P|1.0|E|0x1d|" + "\x1d".join(f"{k}={v}" for k, v in attrs.items())
    out = _parse_leef_line(line)
    assert out is not None
    assert out[5] == attrs


@given(any_text)
@settings(max_examples=1000)
def test_clf_escape_unescape_identity(s):
    escaped = s.replace("\\", "\\\\").replace('"', '\\"')
    assert _clf_unescape(escaped) == s
