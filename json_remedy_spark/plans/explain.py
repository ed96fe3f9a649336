"""Plan inspection helpers — the engine's scale guardrails.

These encode the plan-shape invariants we tune against
(`.explain("formatted")` review per the build brief):

* the pipeline must contain at most MAX_ARROW_HOPS Python boundaries;
* column stages must fuse (WholeStageCodegen present);
* parquet scans must show pushed filters / pruned schemas when the
  caller filters or projects.
"""

from pyspark.sql import DataFrame

MAX_ARROW_HOPS = 1  # the fused repair+perplexity UDF is the only hop


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def arrow_hops(df: DataFrame) -> int:
    return executed_plan(df).count("ArrowEvalPython")


def codegen_subtrees(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (works under AQE, where the
    initial executedPlan string carries no codegen markers)."""
    txt = df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    head = txt.splitlines()[0] if txt else ""
    try:
        return int(head.split()[1])
    except (IndexError, ValueError):
        return 0


def has_codegen(df: DataFrame) -> bool:
    return codegen_subtrees(df) > 0


def scan_info(df: DataFrame) -> dict:
    """PushedFilters / ReadSchema of the first parquet scan in the plan."""
    txt = formatted(df)
    out = {"pushed_filters": None, "read_schema": None}
    for line in txt.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            out["pushed_filters"] = s.split(":", 1)[1].strip()
        elif s.startswith("ReadSchema:"):
            out["read_schema"] = s.split(":", 1)[1].strip()
    return out


def assert_scalable(df: DataFrame, max_arrow_hops: int = MAX_ARROW_HOPS) -> None:
    hops = arrow_hops(df)
    if hops > max_arrow_hops:
        raise AssertionError(f"plan has {hops} Python boundaries (max {max_arrow_hops})")
    if not has_codegen(df):
        raise AssertionError("no WholeStageCodegen span — column stages failed to fuse")
