"""Scale exponents for the banded range-join family (FIRST coverage
for this family — rangejoin.py gained the left-outer branch in round
9, so the currency rule wants the whole family pinned) and the two
round-9-changed gate queries.

Replica construction (operator-aware, per SCALE.md method): events xK
REKEYED BY USER — ``user_id*K + rep``, ``event_id*K + rep``, same
timestamps — so the user population grows xK while per-user event
density stays constant: qualifying (click, purchase) pairs grow ~K
(linear) and per-key join work is unchanged, so the exponent measures
the banded shuffle + probe, not output blow-up (pair counts recorded
at both factors so the reader can verify ~K growth). customer xK via
scale_run_d.expanded_customer: each of the 5 market segments gets Kx
more rows — the rank-pass aggregate grows linearly while the
broadcast sketch table stays 5 rows.

Measured through the SHIPPED code paths (queries.QUERIES entries):

- clicks_in_purchase_window — inner banded range join;
- outer_range_join — LEFT variant (BETWEEN inside the join
  condition; same (user, bucket) equi-shuffle);
- approx_percentiles_gate — exact+sketch agg, then the r9 rank pass
  (second agg joined against the broadcast 5-row sketch table);
- equidepth_by_range, FULL query: its exact-ntile CONTRACT side is a
  deliberate single-partition global sort (the test-scale gate the
  query docstring owns), so the full-query exponent approaches the
  sort's — the separately-timed PRODUCT path (GK sketch aggregate +
  broadcast range-bin count, the only part that ships at 100 TB) is
  what the scale claim rests on; it re-uses the query's own
  HIST_BINS constant and expressions.

Usage: python tools/scale_run_i.py [K] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.caching import release_caches
from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.queries import (
    HIST_BINS,
    QUERIES,
)
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark
from tools.scale_run import _min_of
from tools.scale_run_d import expanded_customer


def expanded_events(spark, sf_dir: str, factor: int):
    """events x factor rekeyed by user: replica r of user u becomes
    user ``u*factor + r`` with the same timestamps/types/values, so
    per-user density (and thus per-key join fan-out) is invariant."""
    ev = read_table(spark, sf_dir, "events")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return ev.crossJoin(reps).select(
        (F.col("event_id") * factor + F.col("rep")).alias("event_id"),
        "ts",
        (F.col("user_id") * factor + F.col("rep")).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def _equidepth_product_path(spark, dirpath: str) -> None:
    """The approx+range PRODUCT side of equidepth_by_range minus the
    exact-ntile contract gate — the part that runs at 100 TB. The cut
    probabilities and the range-binning pass come from the query
    module's own helpers (equidepth_cut_probs /
    equidepth_range_bin_counts), so this measures the SHIPPED kernel
    and cannot drift from it."""
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        equidepth_cut_probs,
        equidepth_range_bin_counts,
    )

    ev = read_table(spark, dirpath, "events").select("value", "event_id")
    plist = ", ".join(repr(p) for p in equidepth_cut_probs(HIST_BINS))
    row = ev.agg(
        F.expr(f"approx_percentile(value, array({plist}), 1000)").alias(
            "acuts"
        )
    ).collect()[0]
    acuts = [float(x) for x in row["acuts"]]
    equidepth_range_bin_counts(ev, acuts)


def run(spark, sf_dir: str, factor: int) -> dict:
    out: dict = {"factor": factor}
    scratch = tempfile.mkdtemp(prefix=f"scalei_{factor}x_")
    try:
        expanded_events(spark, sf_dir, factor).write.mode(
            "overwrite"
        ).parquet(os.path.join(scratch, "events.parquet"))
        expanded_customer(spark, sf_dir, factor).write.mode(
            "overwrite"
        ).parquet(os.path.join(scratch, "customer.parquet"))
        out["n_events"] = spark.read.parquet(
            os.path.join(scratch, "events.parquet")
        ).count()
        out["n_customers"] = spark.read.parquet(
            os.path.join(scratch, "customer.parquet")
        ).count()

        counts: dict = {}

        def _inner():
            release_caches()
            counts["inner"] = QUERIES["clicks_in_purchase_window"](
                spark, scratch
            ).count()

        out["rangejoin_inner_sec"] = _min_of(2, _inner)
        out["rangejoin_inner_pairs"] = counts["inner"]

        def _left():
            release_caches()
            counts["left"] = QUERIES["outer_range_join"](
                spark, scratch
            ).count()

        out["rangejoin_left_sec"] = _min_of(2, _left)
        out["rangejoin_left_rows"] = counts["left"]

        # r10: the FULL variant (left ∪ anti-join-recovered unmatched
        # intervals) — present only in runs taken after rangejoin.py
        # gained the right/full branch
        if "full_outer_range_join" in QUERIES:

            def _full():
                release_caches()
                counts["full"] = QUERIES["full_outer_range_join"](
                    spark, scratch
                ).count()

            out["rangejoin_full_sec"] = _min_of(2, _full)
            out["rangejoin_full_rows"] = counts["full"]

        def _pct():
            release_caches()
            QUERIES["approx_percentiles_gate"](spark, scratch).collect()

        out["approx_pct_gate_sec"] = _min_of(2, _pct)

        def _equi_full():
            release_caches()
            QUERIES["equidepth_by_range"](spark, scratch).collect()

        out["equidepth_full_sec"] = _min_of(2, _equi_full)

        def _equi_prod():
            release_caches()
            _equidepth_product_path(spark, scratch)

        out["equidepth_product_sec"] = _min_of(2, _equi_prod)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def main() -> None:
    import math

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if factor < 2:
        sys.exit("factor must be >= 2 (exponent divides by log(factor))")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r9_rangejoin.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_run_i")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    r1 = run(spark, sf_dir, 1)
    rk = run(spark, sf_dir, factor)
    result = {
        "sf_dir": sf_dir,
        "base": r1,
        "expanded": rk,
        "exponents": {
            k.removesuffix("_sec"): round(
                math.log(rk[k] / r1[k]) / math.log(factor), 2
            )
            for k in (
                "rangejoin_inner_sec",
                "rangejoin_left_sec",
                "approx_pct_gate_sec",
                "equidepth_full_sec",
                "equidepth_product_sec",
                *(("rangejoin_full_sec",) if "rangejoin_full_sec" in r1 else ()),
            )
        },
        "note": (
            "user-rekeyed replicas: range-join output grows ~K by "
            "construction (pair counts recorded) so its exponent "
            "measures shuffle+probe; equidepth_full includes the "
            "deliberate test-scale ntile sort - equidepth_product is "
            "the 100 TB path's exponent"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
