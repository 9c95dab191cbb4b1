"""container parser: docker-json / containerd(CRI) / cri-o log formats.

Reference: operator/parser/container/parser.go:27-68 — auto-detects the
runtime format per line (regexes at parser.go:31-33), extracts
(time, stream, log), and internally recombines partial lines (containerd
marks them P until a final F line).

Formats:
  docker json : {"log":"msg\\n","stream":"stdout","time":"2024-..Z"}
  containerd  : 2024-01-01T00:00:00.000000000Z stdout P msg
  cri-o       : same shape as containerd

Spark mapping: a when-chain over rlike detectors + from_json/regexp
extraction in ONE projection (the bank pattern again); partial-line
recombine is the segment-sum window over (source, line order) with
is_last = flag 'F'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CRI_RE = r"^(\S+Z?) (stdout|stderr) ([PF]) (.*)$"
DOCKER_RE = r'^\{.*"log".*\}$'

_DOCKER_SCHEMA = "log STRING, stream STRING, time STRING"


def container_parser(df: DataFrame, source: str = "line") -> DataFrame:
    """Adds container_format, log_time, stream, partial_flag, log."""
    s = F.col(source)
    is_docker = s.rlike(DOCKER_RE)
    is_cri = s.rlike(CRI_RE)
    docker = F.from_json(s, _DOCKER_SCHEMA)

    fmt = (
        F.when(is_docker, F.lit("docker"))
        .when(is_cri, F.lit("cri"))
        .otherwise(F.lit("raw"))
    )

    def cri_grp(i: int) -> Column:
        return F.regexp_extract(s, CRI_RE, i)

    return df.select(
        "*",
        fmt.alias("container_format"),
        F.when(is_docker, docker["time"]).when(is_cri, cri_grp(1)).alias("log_time"),
        F.when(is_docker, docker["stream"]).when(is_cri, cri_grp(2)).alias("stream"),
        # docker has no partial marker: every json line is final
        F.when(is_docker, F.lit("F")).when(is_cri, cri_grp(3)).alias("partial_flag"),
        F.when(is_docker, F.regexp_replace(docker["log"], r"\n$", ""))
        .when(is_cri, cri_grp(4))
        .otherwise(s)
        .alias("log"),
    )


def recombine_partials(
    df: DataFrame,
    source_col: str,
    order_col: str,
    log_col: str = "log",
    flag_col: str = "partial_flag",
) -> DataFrame:
    """Assemble P...P F runs into one record per logical line
    (parser.go's internal recombine). A segment STARTS where the previous
    row (per source, in order) was final — the segment-sum trick with
    is_first = lag(flag)='F' (or first row). Returns (source, run_id,
    log [assembled], n_parts, first_order, last_order, complete)."""
    w = Window.partitionBy(source_col).orderBy(F.col(order_col))
    prev_flag = F.lag(F.col(flag_col)).over(w)
    is_first = prev_flag.isNull() | (prev_flag == "F")
    runs = df.withColumn("_first", is_first.cast("int")).withColumn(
        "run_id", F.sum("_first").over(w)
    )
    return runs.groupBy(source_col, "run_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(log_col).alias("v")))
                ),
                lambda x: x["v"],
            ),
            "",
        ).alias(log_col),
        F.count(F.lit(1)).alias("n_parts"),
        F.min(order_col).alias("first_order"),
        F.max(order_col).alias("last_order"),
        (F.max(F.when(F.col(flag_col) == "F", 1).otherwise(0)) == 1).alias("complete"),
    )
