"""NetFlow v5 / IPFIX decode kernels vs the netflowreceiver's attribute
surface (receiver/netflowreceiver/parser.go:217-301, enum tables
parser.go:21-192) and the public wire formats (Cisco NetFlow v5 fixed
layout; IPFIX RFC 7011)."""

from __future__ import annotations

import struct

import pytest

from opentelemetry_collector_contrib_spark.operators.netflow import (
    decode_ipfix,
    decode_netflow_v5,
    enc_ipfix,
    enc_netflow_v5,
    parse_ipfix,
    parse_netflow_v5,
    synthesize_ipfix,
    synthesize_netflow_v5,
)

_REC = {
    "src": bytes([10, 1, 2, 3]), "dst": bytes([192, 168, 4, 5]),
    "hop": bytes([10, 0, 0, 254]), "in_if": 3, "out_if": 4,
    "pkts": 7, "octets": 500, "first": 3_590_000, "last": 3_599_000,
    "sport": 1111, "dport": 443, "flags": 0x1B, "proto": 6,
    "src_as": 100, "dst_as": 700,
}


def test_v5_decode_attribute_surface():
    rows = decode_netflow_v5(enc_netflow_v5(1_700_000_123, 42, [_REC]))
    assert len(rows) == 1
    r = rows[0]
    assert r["nf_type"] == "netflow_v5"
    assert (r["nf_src_addr"], r["nf_src_port"]) == ("10.1.2.3", 1111)
    assert (r["nf_dst_addr"], r["nf_dst_port"]) == ("192.168.4.5", 443)
    assert r["nf_transport"] == "tcp" and r["nf_etype"] == "ipv4"
    assert (r["nf_bytes"], r["nf_packets"]) == (500, 7)
    assert r["nf_sequence_num"] == 42 and r["nf_tcp_flags"] == 0x1B
    assert (r["nf_src_as"], r["nf_dst_as"]) == (100, 700)
    assert r["nf_next_hop"] == "10.0.0.254"
    # absolute time = export wall clock - (sys_uptime - offset)
    assert r["nf_start_ms"] == 1_700_000_123_000 - 10_000
    assert r["nf_end_ms"] == 1_700_000_123_000 - 1_000


def test_v5_transport_name_table():
    # parser.go getTransportName: known protocols by IANA name, else "unknown"
    for proto, name in ((17, "udp"), (1, "icmp"), (132, "sctp"), (200, "unknown")):
        rows = decode_netflow_v5(enc_netflow_v5(1, 0, [{**_REC, "proto": proto}]))
        assert rows[0]["nf_transport"] == name


def test_v5_sampling_mode_bits_masked():
    # top 2 bits of the sampling field are the mode; rate is the low 14
    pkt = bytearray(enc_netflow_v5(1, 0, [_REC]))
    struct.pack_into(">H", pkt, 22, 0x4000 | 100)  # mode=1, rate=100
    assert decode_netflow_v5(bytes(pkt))[0]["nf_sampling_rate"] == 100


def test_v5_malformed_packets_raise():
    pkt = enc_netflow_v5(1_700_000_000, 1, [_REC, _REC])
    with pytest.raises(ValueError):
        decode_netflow_v5(pkt[:10])  # short header
    with pytest.raises(ValueError):
        decode_netflow_v5(pkt[:-5])  # count says 2, payload holds fewer bytes
    v9 = bytearray(pkt)
    struct.pack_into(">H", v9, 0, 9)
    with pytest.raises(ValueError):
        decode_netflow_v5(bytes(v9))  # wrong version


_TPL = [
    (8, 4), (12, 4), (7, 2), (11, 2), (4, 1),
    (1, 4), (2, 4), (16, 2), (17, 2), (152, 8), (153, 8),
]


def _ipfix_rec(sport=2100, proto=6):
    ms = 1_700_000_123_000
    return [
        bytes([172, 16, 1, 1]), bytes([10, 0, 2, 3]), sport, 8080, proto,
        999, 12, 77, 231, ms - 5000, ms,
    ]


def test_ipfix_template_and_data_in_one_packet():
    rows = decode_ipfix(enc_ipfix(1_700_000_123, 9, _TPL, [_ipfix_rec(), _ipfix_rec(sport=2101)]))
    assert [r["nf_src_port"] for r in rows] == [2100, 2101]
    r = rows[0]
    assert r["nf_type"] == "ipfix" and r["nf_etype"] == "ipv4"
    assert (r["nf_src_addr"], r["nf_dst_addr"]) == ("172.16.1.1", "10.0.2.3")
    assert r["nf_transport"] == "tcp"
    # reduced-size encoding: 2-byte AS numbers decode as plain unsigned ints
    assert (r["nf_src_as"], r["nf_dst_as"]) == (77, 231)
    assert (r["nf_start_ms"], r["nf_end_ms"]) == (1_700_000_118_000, 1_700_000_123_000)
    assert r["nf_sequence_num"] == 9


def test_ipfix_enterprise_ie_skipped_without_misalignment():
    tpl = [*_TPL, (0x8000 | 100, 4)]
    rows = decode_ipfix(enc_ipfix(1, 0, tpl, [[*_ipfix_rec(), (7).to_bytes(4, "big")]]))
    assert rows[0]["nf_src_port"] == 2100 and rows[0]["nf_dst_port"] == 8080


def test_ipfix_ipv6_addresses():
    tpl = [(27, 16), (28, 16), (7, 2)]
    v6a = bytes.fromhex("20010db8000000000000000000000001")
    v6b = bytes.fromhex("20010db8000000000000000000000002")
    rows = decode_ipfix(enc_ipfix(1, 0, tpl, [[v6a, v6b, 80]]))
    assert rows[0]["nf_src_addr"] == "2001:db8::1"
    assert rows[0]["nf_dst_addr"] == "2001:db8::2"
    assert rows[0]["nf_etype"] == "ipv6"


def test_ipfix_options_sampling_applied_to_flow_records():
    """An options-data record carrying a sampling-interval IE (34/49/305)
    stamps nf_sampling_rate on every flow record of the packet (RFC 7011
    §3.4.2.2 — the sampler-configuration options export)."""
    opts = ([(302, 4), (34, 4)], 1, [[7, 1000]])  # selectorId scope + samplingInterval
    rows = decode_ipfix(enc_ipfix(1, 3, _TPL, [_ipfix_rec(), _ipfix_rec(sport=2101)], options=opts))
    assert [r["nf_sampling_rate"] for r in rows] == [1000, 1000]
    assert [r["nf_src_port"] for r in rows] == [2100, 2101]  # options rows are not flow rows
    # PSAMP form (samplingPacketInterval, IE 305)
    rows = decode_ipfix(enc_ipfix(1, 3, _TPL, [_ipfix_rec()], options=([(305, 4)], 1, [[64]])))
    assert rows[0]["nf_sampling_rate"] == 64
    # zero interval = unconfigured -> keeps the 0 default
    rows = decode_ipfix(enc_ipfix(1, 3, _TPL, [_ipfix_rec()], options=([(34, 4)], 1, [[0]])))
    assert rows[0]["nf_sampling_rate"] == 0


def test_ipfix_options_data_after_flow_data_still_applies():
    """Sampling metadata applies packet-wide regardless of set order: the
    walk collects regions first and stamps afterwards."""
    base = enc_ipfix(1, 3, _TPL, [_ipfix_rec()], options=([(34, 4)], 1, [[500]]))
    # enc_ipfix lays out [opt_tmpl, opt_data, tmpl, data]; splice the
    # options DATA set (2nd set) to the end of the packet
    sets, off = [], 16
    while off < len(base):
        _, set_len = struct.unpack_from(">HH", base, off)
        sets.append(base[off : off + set_len])
        off += set_len
    reordered = base[:16] + sets[0] + sets[2] + sets[3] + sets[1]
    rows = decode_ipfix(reordered)
    assert [r["nf_sampling_rate"] for r in rows] == [500]


def test_ipfix_variable_length_ie_alignment():
    """RFC 7011 §7: a varlen IE (length 0xFFFF) carries a 1-byte length
    prefix (255 escapes to 2-byte). Its content is skipped but the fixed
    fields around it must stay aligned — including a >=255-byte value
    and a record after it."""
    tpl = [(7, 2), (82, 0xFFFF), (11, 2)]  # interfaceName: varlen string
    recs = [
        [1001, b"eth0", 443],
        [1002, b"x" * 300, 8080],   # 255-escaped 2-byte length
        [1003, b"", 9092],          # zero-length value
    ]
    rows = decode_ipfix(enc_ipfix(1, 5, tpl, recs))
    assert [(r["nf_src_port"], r["nf_dst_port"]) for r in rows] == [
        (1001, 443), (1002, 8080), (1003, 9092),
    ]
    assert all(r["nf_sequence_num"] == 5 for r in rows)


def test_ipfix_varlen_truncated_record_stops_cleanly():
    """A varlen record that overruns the set emits nothing past the last
    clean record (truncation == trailing-padding handling)."""
    tpl = [(7, 2), (82, 0xFFFF)]
    pkt = bytearray(enc_ipfix(1, 0, tpl, [[80, b"abc"], [81, b"defgh"]]))
    # corrupt the SECOND record's length prefix to point past the set end
    # layout: ...data_set_hdr(4) + rec1(2+1+3) + rec2 starts at +6
    data_off = len(pkt) - (2 + 1 + 3) - (2 + 1 + 5)
    pkt[data_off + 6 + 2] = 250  # rec2's varlen prefix now overruns
    rows = decode_ipfix(bytes(pkt))
    assert [(r["nf_src_port"]) for r in rows] == [80]


def test_ipfix_varlen_vectorized_matches_scalar():
    import pandas as pd

    from opentelemetry_collector_contrib_spark.operators.netflow import _ipfix_decode_batch

    tpl = [(8, 4), (7, 2), (82, 0xFFFF), (1, 4)]
    pkts = [
        enc_ipfix(1, i, tpl, [[bytes([10, 0, 0, i % 250]), 2000 + i, b"if%d" % i, i * 3]])
        for i in range(20)
    ]
    ref = [{"k": k, **d} for k, p in enumerate(pkts) for d in decode_ipfix(p)]
    pdf = pd.DataFrame({"k": range(len(pkts)), "payload": pkts})
    out = _ipfix_decode_batch(pdf["payload"], pdf, ["k"]).sort_values("k").reset_index(drop=True)
    ref_df = pd.DataFrame(ref)[list(out.columns)].sort_values("k").reset_index(drop=True)
    assert len(ref_df) == len(out) == 20
    for c in ref_df.columns:
        assert ref_df[c].tolist() == out[c].tolist(), c


def test_ipfix_cross_packet_template_cache(spark):
    """Data-only packets (no in-packet template) decode through the
    harvested per-observation-domain broadcast; a domain with no template
    anywhere in the spool still drops, and in-packet templates override
    the shared ones."""
    from opentelemetry_collector_contrib_spark.operators.netflow import (
        collect_ipfix_templates,
        parse_ipfix,
    )

    tpl_a = [(7, 2), (11, 2)]
    tpl_b = [(7, 4), (11, 4)]  # wider layout under its own tid (RFC: tids unique per domain)
    pkts = [
        enc_ipfix(1, 0, tpl_a, [[80, 443]], odid=1),                           # template source, odid 1
        enc_ipfix(1, 1, tpl_a, [[81, 8080]], odid=1, include_template=False),  # data-only, cache hit
        enc_ipfix(1, 2, tpl_a, [[82, 9092]], odid=2, include_template=False),  # odid 2: no template -> drop
        enc_ipfix(1, 3, tpl_b, [[99, 7000]], odid=1, template_id=257),         # second tid, in-packet
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pkts)], "k int, payload binary")
    shared = collect_ipfix_templates(df)
    assert set(shared) == {1} and set(shared[1]) == {256, 257}
    assert shared[1][256] == ("t", ((7, 2), (11, 2)))
    rows = {r.k: r for r in parse_ipfix(df, "payload", shared_templates=shared).collect()}
    assert set(rows) == {0, 1, 3}
    assert (rows[1].nf_src_port, rows[1].nf_dst_port) == (81, 8080)
    assert (rows[3].nf_src_port, rows[3].nf_dst_port) == (99, 7000)
    # without the cache the data-only packet drops
    assert {r.k for r in parse_ipfix(df, "payload").collect()} == {0, 3}


_V9_TPL = [
    (8, 4), (12, 4), (7, 2), (11, 2), (4, 1),
    (1, 4), (2, 4), (16, 2), (17, 2), (22, 4), (21, 4),
]


def _v9_rec(sport=3100, proto=6, uptime=3_600_000):
    return [
        bytes([172, 16, 9, 1]), bytes([10, 0, 2, 3]), sport, 8080, proto,
        4242, 17, 77, 231, uptime - 5000, uptime,
    ]


def test_netflow_v9_decode_rebases_switched_times():
    from opentelemetry_collector_contrib_spark.operators.netflow import (
        decode_netflow_v9,
        enc_netflow_v9,
    )

    secs, uptime = 1_700_000_123, 3_600_000
    rows = decode_netflow_v9(
        enc_netflow_v9(secs, 11, _V9_TPL, [_v9_rec(), _v9_rec(sport=3101)], uptime_ms=uptime)
    )
    assert [r["nf_src_port"] for r in rows] == [3100, 3101]
    r = rows[0]
    assert r["nf_type"] == "netflow_v9" and r["nf_transport"] == "tcp"
    assert (r["nf_src_addr"], r["nf_dst_addr"]) == ("172.16.9.1", "10.0.2.3")
    # boot = secs*1000 - uptime; start = boot + (uptime-5000) = secs*1000 - 5000
    assert r["nf_start_ms"] == secs * 1000 - 5000
    assert r["nf_end_ms"] == secs * 1000
    assert r["nf_sequence_num"] == 11 and r["nf_sampling_rate"] == 0


def test_netflow_v9_options_sampling_and_malformed():
    from opentelemetry_collector_contrib_spark.operators.netflow import (
        decode_netflow_v9,
        enc_netflow_v9,
    )

    opts = ([(1, 4)], [(34, 4)], [[0, 512]])  # scope System + samplingInterval
    pkt = enc_netflow_v9(1_700_000_000, 4, _V9_TPL, [_v9_rec()], options=opts)
    rows = decode_netflow_v9(pkt)
    assert len(rows) == 1 and rows[0]["nf_sampling_rate"] == 512
    with pytest.raises(ValueError, match="short netflow v9 header"):
        decode_netflow_v9(pkt[:12])
    with pytest.raises(ValueError, match="version"):
        decode_netflow_v9(enc_ipfix(1, 0, _TPL, [_ipfix_rec()]))
    with pytest.raises(ValueError, match="bad flowset length"):
        decode_netflow_v9(pkt[:-3])


def test_netflow_v9_vectorized_batch_equals_scalar_decoder():
    import pandas as pd

    from opentelemetry_collector_contrib_spark.operators.netflow import (
        _ipfix_decode_batch,
        _nfv9_scan_packet,
        decode_netflow_v9,
        enc_netflow_v9,
    )

    pkts = []
    for i in range(30):
        pkts.append(enc_netflow_v9(1_700_000_000 + i, i, _V9_TPL,
                                   [_v9_rec(sport=3000 + i), _v9_rec(proto=17)],
                                   uptime_ms=3_600_000 + i * 7,
                                   options=([(1, 4)], [(34, 4)], [[0, (i % 3) * 128]])))
    # odd-width field -> scalar fallback group
    pkts.append(enc_netflow_v9(1, 7, [(1, 3), (7, 2), (22, 4)], [[0x010203, 8080, 100]]))
    pkts += [pkts[0][:-3], b"\x00\x09xx", None]
    ref = []
    for k, p in enumerate(pkts):
        if p is None:
            continue
        try:
            ref.extend({"k": k, **d} for d in decode_netflow_v9(bytes(p)))
        except ValueError:
            continue
    pdf = pd.DataFrame({"k": range(len(pkts)), "payload": pkts})
    out = _ipfix_decode_batch(pdf["payload"], pdf, ["k"],
                              _nfv9_scan_packet, "netflow_v9").reset_index(drop=True)
    key = ["k", "nf_src_port", "nf_sequence_num"]
    ref_df = pd.DataFrame(ref)[list(out.columns)].sort_values(key).reset_index(drop=True)
    out_s = out.sort_values(key).reset_index(drop=True)
    assert len(ref_df) == len(out_s) > 0
    for c in ref_df.columns:
        assert ref_df[c].tolist() == out_s[c].tolist(), c


def test_ipfix_orphan_data_set_skipped():
    # data set whose template never arrived in this packet -> no rows, no guess
    pkt = enc_ipfix(1, 0, _TPL, [_ipfix_rec()], template_id=256)
    # retarget the data set header to template 999 (template set stays 256)
    body = bytearray(pkt)
    data_set_off = 16 + 4 + 4 + 4 * len(_TPL)  # header + tmpl set hdr + tmpl body
    assert struct.unpack_from(">H", body, data_set_off)[0] == 256
    struct.pack_into(">H", body, data_set_off, 999)
    assert decode_ipfix(bytes(body)) == []


def test_ipfix_trailing_padding_tolerated():
    pkt = bytearray(enc_ipfix(1, 0, [(7, 2), (11, 2)], [[80, 443]]))
    # grow the data set by 3 pad bytes (< one 4-byte record)
    pkt += b"\x00\x00\x00"
    struct.pack_into(">H", pkt, 2, len(pkt))          # packet length
    struct.pack_into(">H", pkt, 16 + 4 + 4 + 8 + 2, 4 + 4 + 3)  # data set length
    rows = decode_ipfix(bytes(pkt))
    assert [(r["nf_src_port"], r["nf_dst_port"]) for r in rows] == [(80, 443)]


def test_ipfix_malformed_raises():
    pkt = enc_ipfix(1, 0, _TPL, [_ipfix_rec()])
    with pytest.raises(ValueError):
        decode_ipfix(pkt[:8])  # short header
    with pytest.raises(ValueError):
        decode_ipfix(pkt[:-3])  # declared length past payload end
    v5 = bytearray(pkt)
    struct.pack_into(">H", v5, 0, 5)
    with pytest.raises(ValueError):
        decode_ipfix(bytes(v5))


def test_spark_roundtrip_and_malformed_rows_drop(spark):
    df = spark.range(4).selectExpr("id AS event_id", "id % 2 AS user_id")
    out = parse_netflow_v5(synthesize_netflow_v5(df), "payload")
    rows = out.orderBy("event_id", "nf_dst_port").collect()
    assert len(rows) == 8  # 2 flow records per packet
    assert {r["nf_transport"] for r in rows} == {"tcp", "udp"}
    # a corrupted payload drops its packet, keeps everyone else's
    from pyspark.sql import functions as F

    bad = synthesize_netflow_v5(df).withColumn(
        "payload",
        F.when(F.col("event_id") == 2, F.lit(b"\x00\x05garbage")).otherwise(F.col("payload")),
    )
    assert parse_netflow_v5(bad, "payload").count() == 6

    out6 = parse_ipfix(synthesize_ipfix(df), "payload")
    assert out6.count() == 8
    assert out6.filter("nf_transport = 'sctp'").count() == 4


# --- sFlow v5 -----------------------------------------------------------------

from opentelemetry_collector_contrib_spark.operators.netflow import (  # noqa: E402
    decode_sflow,
    enc_sflow,
    eth_ipv4_frame,
    parse_sflow,
    synthesize_sflow,
)


def test_sflow_flow_sample_header_reconstruction():
    frame = eth_ipv4_frame(bytes([10, 1, 5, 1]), bytes([10, 2, 9, 5]), 6, 3456, 8443,
                           tcp_flags=0x18, tos=0x10)
    pkt = enc_sflow(77, [{"header": frame, "frame_len": 900, "rate": 64,
                          "in_if": 2, "out_if": 5}])
    r, = decode_sflow(pkt)
    assert r["nf_type"] == "sflow_5"
    assert (r["nf_src_addr"], r["nf_src_port"]) == ("10.1.5.1", 3456)
    assert (r["nf_dst_addr"], r["nf_dst_port"]) == ("10.2.9.5", 8443)
    assert r["nf_transport"] == "tcp" and r["nf_etype"] == "ipv4"
    assert r["nf_tcp_flags"] == 0x18 and r["nf_ip_tos"] == 0x10
    assert (r["nf_bytes"], r["nf_packets"]) == (900, 1)
    assert (r["nf_sequence_num"], r["nf_sampling_rate"]) == (77, 64)
    assert (r["nf_in_if"], r["nf_out_if"]) == (2, 5)


def test_sflow_vlan_tag_and_non_ip_frames():
    frame = eth_ipv4_frame(bytes([10, 1, 1, 1]), bytes([10, 2, 2, 2]), 17, 68, 67)
    vlan = frame[:12] + b"\x81\x00\x00\x05" + frame[12:]
    r, = decode_sflow(enc_sflow(1, [{"header": vlan, "frame_len": 100}]))
    assert r["nf_src_addr"] == "10.1.1.1" and r["nf_transport"] == "udp"
    arp = frame[:12] + b"\x08\x06" + b"\x00" * 28
    r, = decode_sflow(enc_sflow(1, [{"header": arp, "frame_len": 60}]))
    assert r["nf_etype"] == "arp" and r["nf_src_addr"] is None and r["nf_src_port"] == 0


def test_sflow_counter_sample_skipped():
    frame = eth_ipv4_frame(bytes([10, 0, 0, 1]), bytes([10, 0, 0, 2]), 6, 1, 2)
    pkt = bytearray(enc_sflow(3, [{"header": frame, "frame_len": 64}]))
    # prepend a counter sample (type 2) before the flow sample; the
    # datagram header is 28 bytes (version af agent sub_agent seq uptime n)
    counter = struct.pack(">II", 2, 8) + b"\x00" * 8
    body = bytearray(bytes(pkt[:28]) + counter + bytes(pkt[28:]))
    struct.pack_into(">I", body, 24, 2)  # n_samples = 2
    rows = decode_sflow(bytes(body))
    assert len(rows) == 1 and rows[0]["nf_src_addr"] == "10.0.0.1"


def test_sflow_malformed_raises():
    frame = eth_ipv4_frame(bytes([10, 0, 0, 1]), bytes([10, 0, 0, 2]), 6, 1, 2)
    pkt = enc_sflow(3, [{"header": frame, "frame_len": 64}])
    with pytest.raises(ValueError):
        decode_sflow(pkt[:10])
    with pytest.raises(ValueError):
        decode_sflow(pkt[:-4])
    v4 = bytearray(pkt)
    struct.pack_into(">I", v4, 0, 4)
    with pytest.raises(ValueError):
        decode_sflow(bytes(v4))


def test_sflow_spark_roundtrip(spark):
    df = spark.range(3).selectExpr("id AS event_id", "id + 10 AS user_id")
    out = parse_sflow(synthesize_sflow(df), "payload")
    rows = out.orderBy("event_id", "nf_dst_port").collect()
    assert len(rows) == 6
    assert {r["nf_dst_port"] for r in rows} == {8443, 514}
    assert {r["nf_sampling_rate"] for r in rows} == {64, 128}


def test_v5_vectorized_batch_equals_reference_decoder():
    """The numpy batch path (used by parse_netflow_v5) must agree with the
    per-packet reference decoder row for row — including which malformed
    packets drop — on a mixed batch of variable-record packets."""
    import random

    import pandas as pd

    from opentelemetry_collector_contrib_spark.operators.netflow import _v5_decode_batch

    random.seed(11)
    pkts = []
    for i in range(300):
        recs = [
            {**_REC, "sport": 1000 + i, "dport": r, "proto": random.choice([6, 17, 200]),
             "octets": i * 31 + r}
            for r in range(random.randint(1, 9))
        ]
        pkts.append(enc_netflow_v5(1_700_000_000 + i, i, recs))
    mixed = pkts + [b"\x00\x05garbage", None, pkts[0][:-7], b""]
    pdf = pd.DataFrame({"k": range(len(mixed)), "payload": mixed})

    ref = []
    for k, p in enumerate(mixed):
        if p is None:
            continue
        try:
            decoded = decode_netflow_v5(bytes(p))
        except ValueError:
            continue
        ref.extend({"k": k, **d} for d in decoded)
    ref_df = pd.DataFrame(ref)
    out = _v5_decode_batch(pdf["payload"], pdf, ["k"]).reset_index(drop=True)
    assert list(out.columns) == list(ref_df.columns)
    for c in out.columns:
        assert ref_df[c].tolist() == out[c].tolist(), c


def test_netflow_stream_equals_batch_via_wire_spool(spark, tmp_path):
    """The flow decoders are WIRE_DECODERS entries: an availableNow drain
    over a payload spool must equal the batch parse of the same files."""
    from opentelemetry_collector_contrib_spark.sources.file_source import wire_spool_source

    df = spark.range(25).selectExpr("id AS event_id", "id % 7 AS user_id")
    spool = str(tmp_path / "nf_spool")
    synthesize_netflow_v5(df).write.parquet(spool)
    batch = wire_spool_source(spark, spool, "netflow_v5")
    sdf = wire_spool_source(spark, spool, "netflow_v5", streaming=True)
    out = str(tmp_path / "out")
    (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    cols = ["event_id", "nf_src_addr", "nf_dst_port", "nf_bytes", "nf_start_ms"]
    got = spark.read.parquet(out).select(cols).collect()
    want = batch.select(cols).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)) and len(want) == 50


def test_ipfix_oversized_ie_value_drops_packet():
    # a counter >= 2^63 cannot land in a bigint column; the packet is
    # corrupt and must drop via ValueError, not abort at Arrow conversion
    tpl = [(1, 8), (7, 2)]
    pkt = enc_ipfix(1, 0, tpl, [[0xFFFFFFFFFFFFFFFF, 80]])
    with pytest.raises(ValueError):
        decode_ipfix(pkt)
    tpl2 = [(7, 4)]  # reduced-size port wider than int32
    with pytest.raises(ValueError):
        decode_ipfix(enc_ipfix(1, 0, tpl2, [[0x80000000]]))


def test_sflow_declared_record_length_past_body_raises():
    frame = eth_ipv4_frame(bytes([10, 0, 0, 1]), bytes([10, 0, 0, 2]), 6, 1, 2)
    pkt = bytearray(enc_sflow(3, [{"header": frame, "frame_len": 64}]))
    # sample body starts at 28+8; record header rec_len field is 4 bytes
    # after the 32-byte flow-sample prefix + 4-byte record type
    rec_len_off = 28 + 8 + 32 + 4
    struct.pack_into(">I", pkt, rec_len_off, 0xFFFF)
    with pytest.raises(ValueError, match="truncated flow record"):
        decode_sflow(bytes(pkt))


def test_ipfix_vectorized_batch_equals_scalar_decoder():
    """The template-grouped numpy path (used by parse_ipfix) must agree
    with decode_ipfix row for row across mixed templates, reduced-size
    widths, IPv6, odd-width fallback layouts, and malformed packets."""
    import pandas as pd

    from opentelemetry_collector_contrib_spark.operators.netflow import _ipfix_decode_batch

    ms = 1_700_000_123_000
    pkts = []
    # standard template (vectorizable)
    for i in range(40):
        pkts.append(enc_ipfix(1, i, _TPL, [_ipfix_rec(sport=2000 + i), _ipfix_rec(proto=17)]))
    # IPv6 template
    tpl6 = [(27, 16), (28, 16), (7, 2), (4, 1)]
    v6a = bytes.fromhex("20010db8000000000000000000000001")
    v6b = bytes.fromhex("20010db8000000000000000000000002")
    pkts.append(enc_ipfix(1, 99, tpl6, [[v6a, v6b, 443, 6]]))
    # odd-width (3-byte counter) -> scalar fallback group
    tpl_odd = [(1, 3), (7, 2)]
    pkts.append(enc_ipfix(1, 7, tpl_odd, [[0x010203, 8080]]))
    # enterprise-IE skip + unknown IE
    tpl_ent = [*_TPL, (0x8000 | 100, 4), (999, 2)]
    pkts.append(enc_ipfix(1, 5, tpl_ent, [[*_ipfix_rec(), (1).to_bytes(4, "big"), 3]]))
    # options-template sampling metadata (vectorized group must stamp it too)
    pkts.append(enc_ipfix(1, 6, _TPL, [_ipfix_rec(sport=2107), _ipfix_rec(sport=2108)],
                          options=([(302, 4), (34, 4)], 1, [[7, 250]])))
    # malformed: truncated, wrong version, oversize port (drops whole packet
    # in both paths — single data set)
    good = enc_ipfix(1, 0, _TPL, [_ipfix_rec()])
    pkts += [good[:-3], b"\x00\x05xx", enc_ipfix(1, 0, [(7, 4)], [[0x80000000]]), None]

    ref = []
    for k, p in enumerate(pkts):
        if p is None:
            continue
        try:
            decoded = decode_ipfix(bytes(p))
        except ValueError:
            continue
        ref.extend({"k": k, **d} for d in decoded)
    pdf = pd.DataFrame({"k": range(len(pkts)), "payload": pkts})
    out = _ipfix_decode_batch(pdf["payload"], pdf, ["k"]).reset_index(drop=True)
    ref_df = pd.DataFrame(ref)[list(out.columns)]
    key = ["k", "nf_src_port", "nf_sequence_num"]
    ref_s = ref_df.sort_values(key).reset_index(drop=True)
    out_s = out.sort_values(key).reset_index(drop=True)
    assert len(ref_s) == len(out_s)
    for c in ref_s.columns:
        assert ref_s[c].tolist() == out_s[c].tolist(), c
