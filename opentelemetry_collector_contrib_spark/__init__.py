"""opentelemetry_collector_contrib_spark — a from-scratch PySpark-native
re-expression of the OTel collector-contrib log pipeline
(parse → enrich → route → aggregate) over transcript tables.

Reference semantics: apeirora/opentelemetry-collector-contrib (Go), studied
at /root/reference (read-only). This package is NOT a port: the reference is
a row-at-a-time streaming daemon; this is a columnar DataFrame engine that
lets Catalyst plan the physical execution.

Subpackages
-----------
fixtures   deterministic synthetic transcript tables (input_hint schema)
sources    table readers + file source w/ lineage (filelog receiver analogue)
operators  parse / transform / filter / enrich / route / aggregate / dedupe
functions  OTTL function registry → Spark Column expressions
plans      config-driven pipeline compiler + lineage manifest
streaming  Structured Streaming analogues of the stateful operators
"""

__version__ = "0.1.0"
