"""Plan inspection CLI: print the physical plan of any registered query.

    python -m gpu_accelerated_vector_indexing_spark.explain knn_ivf_combined
    python -m gpu_accelerated_vector_indexing_spark.explain pricing_summary \
        --sf-dir /root/testdata/sf0.01 --mode formatted

The workflow the engine was tuned with: after an operator is correct,
``explain`` it and check the plan is the one you'd want at 100 TB —
filters pushed to the scan (``PushedFilters``), dims broadcast
(``BroadcastHashJoin``), top-k as ``TakeOrderedAndProject``, partition
pruning on the index layout. ``tests/test_plans.py`` pins those
properties; this CLI is the interactive form.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    from gpu_accelerated_vector_indexing_spark.queries import merged
    from gpu_accelerated_vector_indexing_spark.session import get_spark

    queries, _ = merged()
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("query", choices=sorted(queries), metavar="QUERY",
                   help="registered query name (see COVERAGE.md)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--mode", default="formatted",
                   choices=("simple", "extended", "formatted", "cost", "codegen"))
    args = p.parse_args(argv)

    spark = get_spark()
    df = queries[args.query](spark, args.sf_dir)
    df.explain(mode=args.mode)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
