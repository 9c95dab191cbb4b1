"""Property tests for the relabel engine: adversarial label values
(regex metacharacters, separators embedded in values, unicode), the
keep/drop partition invariant, and hashmod range/agreement."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.prom_relabel import relabel

_VALUES = st.text(
    alphabet=st.sampled_from(list("abcXYZ019 .*+?()[]{}|\\^$;/=é中")), max_size=12
)
_MAPS = st.dictionaries(
    st.sampled_from(["job", "instance", "__address__", "app", "zone"]), _VALUES, max_size=5
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_MAPS, min_size=1, max_size=25))
def test_keep_drop_partition_and_hashmod_range(spark, rows):
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(rows)], "id int, labels map<string,string>"
    ).persist()
    total = df.count()

    # keep and drop with the same rule partition the input exactly
    rule = {"source_labels": ["job", "app"], "separator": ";", "regex": ".*[a\\\\].*"}
    kept = relabel(df, [{**rule, "action": "keep"}]).count()
    dropped = relabel(df, [{**rule, "action": "drop"}]).count()
    assert kept + dropped == total

    # hashmod lands in [0, modulus) and matches the reference md5 rule
    out = relabel(
        df,
        [{"action": "hashmod", "source_labels": ["__address__", "job"], "modulus": 97,
          "target_label": "shard"}],
    ).select("id", F.element_at("labels", F.lit("shard")).alias("shard")).collect()
    for r in out:
        shard = int(r["shard"])
        assert 0 <= shard < 97
        m = rows[r["id"]]
        val = ";".join([m.get("__address__", ""), m.get("job", "")])
        digest = hashlib.md5(val.encode()).digest()
        assert shard == int.from_bytes(digest[8:16], "big") % 97
    df.unpersist()


@settings(max_examples=5, deadline=None)
@given(st.lists(_MAPS, min_size=1, max_size=25))
def test_labeldrop_labelkeep_complementary(spark, rows):
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(rows)], "id int, labels map<string,string>"
    )
    regex = "__.*|app"
    dropped = {
        r["id"]: set((r["labels"] or {}).keys())
        for r in relabel(df, [{"action": "labeldrop", "regex": regex}]).collect()
    }
    kept = {
        r["id"]: set((r["labels"] or {}).keys())
        for r in relabel(df, [{"action": "labelkeep", "regex": regex}]).collect()
    }
    for i, m in enumerate(rows):
        assert dropped[i] | kept[i] == set(m.keys())
        assert dropped[i] & kept[i] == set()


@settings(max_examples=5, deadline=None)
@given(st.lists(_MAPS, min_size=1, max_size=25))
def test_replace_default_regex_copies_value(spark, rows):
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(rows)], "id int, labels map<string,string>"
    )
    out = relabel(
        df,
        [{"action": "replace", "source_labels": ["job"], "target_label": "job_copy"}],
    ).collect()
    for r in out:
        m = rows[r["id"]]
        got = dict(r["labels"] or {})
        expect = m.get("job", "")
        if expect == "":
            assert "job_copy" not in got  # empty expansion deletes
        else:
            assert got["job_copy"] == expect
