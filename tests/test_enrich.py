

def test_k8s_attributes_association_priority_and_metadata(spark):
    """First association whose FACT columns are present wins; a selected
    rule whose lookup misses leaves the row unenriched (later rules are
    not tried) — pod_association.go:20-66 semantics."""
    from opentelemetry_collector_contrib_spark.operators.enrich import k8s_attributes

    pod_dim = spark.createDataFrame(
        [
            ("10.1.1.1", "uid-a", "ns1", "pod-a", "node-1"),
            ("10.1.1.2", "uid-b", "ns2", "pod-b", "node-2"),
        ],
        "pod_ip string, pod_uid string, k8s_namespace_name string, k8s_pod_name string, k8s_node_name string",
    )
    facts = spark.createDataFrame(
        [
            # rule 0 (by uid) resolves and hits
            ("r1", "uid-a", None),
            # rule 0 source missing -> rule 1 (by ip) hits
            ("r2", None, "10.1.1.2"),
            # rule 0 resolves but MISSES the store: stays unenriched even
            # though the ip would have matched rule 1
            ("r3", "uid-zz", "10.1.1.1"),
            # nothing present
            ("r4", None, None),
        ],
        "id string, k8s_pod_uid_attr string, k8s_pod_ip string",
    )
    out = {
        r["id"]: (r["k8s_namespace_name"], r["k8s_pod_name"], r["k8s_node_name"])
        for r in k8s_attributes(
            facts,
            pod_dim,
            associations=[
                [("k8s_pod_uid_attr", "pod_uid")],
                [("k8s_pod_ip", "pod_ip")],
            ],
        ).collect()
    }
    assert out["r1"] == ("ns1", "pod-a", "node-1")
    assert out["r2"] == ("ns2", "pod-b", "node-2")
    assert out["r3"] == (None, None, None)
    assert out["r4"] == (None, None, None)


def test_k8s_attributes_label_and_annotation_extraction(spark):
    from opentelemetry_collector_contrib_spark.operators.enrich import k8s_attributes

    pod_dim = spark.createDataFrame(
        [("10.1.1.1", "ns1", {"app": "web", "tier": "fe", "rel": "r9"}, {"team": "core"})],
        "pod_ip string, k8s_namespace_name string, labels map<string,string>, annotations map<string,string>",
    )
    facts = spark.createDataFrame([("r1", "10.1.1.1")], "id string, k8s_pod_ip string")
    out = k8s_attributes(
        facts,
        pod_dim,
        label_rules=[
            {"key": "app"},
            {"key_regex": "t.*", "out_col": "t_labels"},
        ],
        annotation_rules=[{"key": "team", "tag_name": "owner_team"}],
    ).collect()[0]
    assert out["k8s_pod_labels_app"] == "web"
    assert dict(out["t_labels"]) == {"tier": "fe"}
    assert out["owner_team"] == "core"


def test_k8s_attributes_plan_is_broadcast_no_fact_shuffle(spark):
    from opentelemetry_collector_contrib_spark.operators.enrich import k8s_attributes

    pod_dim = spark.createDataFrame(
        [("10.1.1.1", "ns1")], "pod_ip string, k8s_namespace_name string"
    )
    facts = spark.createDataFrame(
        [(f"r{i}", f"10.1.1.{i%3}") for i in range(100)], "id string, k8s_pod_ip string"
    )
    out = k8s_attributes(facts, pod_dim)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # fact side never shuffles
