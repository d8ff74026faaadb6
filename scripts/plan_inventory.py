"""Generate PLANS.md: measured physical-plan statistics for every driver
query — exchange (shuffle) count, join strategies, and whole-stage-codegen
presence — at a given scale factor.

Plan shape is a first-class deliverable of this engine (the 100 TB design
brief): this inventory makes the shuffle budget of each operator auditable
and regressions visible in review.

Usage: python scripts/plan_inventory.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-inventory")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # full column counts per source table, for the pruning audit
    from catabra_pandas_spark.sources import TABLES, read_table
    full_width = {t: len(read_table(spark, sf_dir, t).columns) for t in TABLES}

    def pruning(plan: str) -> str:
        """Column-pruning audit: per FileScan, output-attribute count vs
        the full table width (a scan reading all columns for a narrow
        query is a pushdown failure).  Returns e.g. '2/6,3/11' per scan.
        Parsed line-wise — each physical node is one explain line, so the
        scan's own attribute list and location cannot be confused with a
        neighboring scan's."""
        out = []
        for line in plan.splitlines():
            if "FileScan parquet" not in line:
                continue
            mcols = re.search(r"FileScan parquet [^\[]*\[([^\]]*)\]", line)
            mloc = re.search(r"InMemoryFileIndex[^\[]*\[([^\]]*)\]", line)
            if not (mcols and mloc):
                continue
            table = (mloc.group(1).rstrip("/").rsplit("/", 1)[-1]
                     .replace(".parquet", ""))
            cols = mcols.group(1).strip()
            ncols = 0 if not cols else cols.count(",") + 1
            out.append(f"{ncols}/{full_width.get(table, '?')}")
        return ",".join(out) or "-"

    rows = []
    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
        rows.append({
            "query": name,
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "python": len(re.findall(
                r"ArrowEvalPython|FlatMapGroupsInPandas"
                r"|FlatMapCoGroupsInPandas|MapInPandas|PythonMapInArrow",
                plan)),
            "pruned": pruning(plan),
        })

    lines = [
        "# PLANS — physical-plan inventory (generated)",
        "",
        f"`scripts/plan_inventory.py {sf_dir}` — static plan statistics for",
        "every driver query.  Exchange = shuffle boundary (lower is better;",
        "broadcast joins at this SF become shuffled SMJ/SHJ joins on the",
        "equi-keys at cluster scale — strategy chosen by Catalyst+AQE, not",
        "hard-coded).  `python` counts Arrow-batched pandas-UDF operators",
        "(the only Python on executors; no row-at-a-time UDFs exist).",
        "",
        "`scan cols` audits column pruning: ReadSchema width / full table",
        "width per parquet scan — a narrow query scanning every column is a",
        "pushdown failure.",
        "",
        "| query | exchanges | broadcast HJ | BNLJ | sort-merge | shuffled HJ | arrow-python | scan cols |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['query']} | {r['exchanges']} | {r['bhj']} | {r['bnlj']} "
            f"| {r['smj']} | {r['shj']} | {r['python']} | {r['pruned']} |")
    lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out} ({len(rows)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
