"""CLI entry point — the spark-submit orchestration surface (north rule).

    spark-submit --py-files dist/dv_engine.zip -m ... \
        python -m dsci_524_g26_data_validation_spark <cmd> ...

Commands (input = parquet path or catalog/Iceberg table name):

    infer     --input T --output contract.json [--max-categories N]
              [--profile]   (adds P6 stats to the JSON report)
    validate  --input T --contract contract.json [--no-strict]
              [--violations-out PATH] [--fail]
    table-validate --input T --table-contract tc.json
              [--reference T2] [--dim name=T ...]
              [--resume-manifest DIR --partition-col COL --run-id ID]
    compare   --old a.json --new b.json
    dedup     --input T --output PATH [--method exact|near]
              [--text-col C] [--id-col C] [--threshold F]
    near-dedup --input T --output PATH
              --mode minhash|containment|semantic|incremental
              [--verify jaccard|edit] [--keep first|best]
              [--metric-col C] [--threshold F] [--shingle-size N]
              [--max-df N] [--vec-col C]
              [--index-dir DIR [--init-index | --update-index]]
              (the full near-dup engine menu behind one flag; --keep
              best elects the argmax-metric survivor — for containment
              that keeps the CONTAINING document)
    decontaminate --input T --benchmark T2 --output PATH
              [--ngram N] [--text-col C] [--id-col C]
    quarantine --input T --contract contract.json --output PATH
              (single-job routing: PATH/is_valid=true|false + counts)
    strip-lines --input T --output PATH [--min-doc-frac F | --min-docs N]
              [--min-line-chars N] [--text-col C] [--id-col C]
    skew      --input T --key COL[,COL] [--top-k N] [--salt-target F]
    span-census --input T [--tokens-col C] [--group-col C] [--k N]
              [--sample-mod P]   (token-level duplicate-span census)
    split     --input T --splits train=0.8,val=0.1,test=0.1
              [--id-col C] [--salt S] [--content-col C]
              [--output PATH]   (deterministic md5 split; census +
              exact cross-split leakage audit when --content-col given;
              PATH written partitioned by split)
    join-preflight --left T --right T2 --keys K[,K...] [--top-k N]
              (exact predicted join cardinality + overlap census +
              hot-key witnesses, before any join runs)
    partition-diff --left T --right T2 --partition-col C
              [--cols C,...] [--portable]   (Merkle digest-sum diff:
              match/differs/only_left/only_right per partition value)
    file-order --input T --key COL [--descending] [--per-file] [--fail]
              (within-file sort-order census: is the declared sort
              order still honoured inside each physical file?)
    suggest   --input T --output contract.json [--budget F] [--approx]
              (contract advisor: quantile-budgeted numeric bounds +
              the realized violation counts they would produce today)
    json-contract --input T --rules rules.json [--col C]
              [--declared-only] [--id-col C --violations-out PATH]
              [--fail]   (per-field contract over a JSON payload
              column: required/dtype/range/domain/pattern facets)
    interleave --input T --order-col C [--shard-col C] [--source-col C]
              (training-order mixing census: per-shard run lengths,
              entropy, JS divergence vs the global source mix)
    datacard  --input T [--text-col C] [--id-col C] [--source-col C]
              [--output PATH]   (one-command dataset card: column
              profile + source shares + text/quality summary + exact-
              dup estimate, each section one fused pass)

Every command prints ONE JSON report to stdout (machine-parseable; logs
go to stderr) and exits 0/1 per the verdict when --fail is given.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import Optional

from . import (
    Contract,
    compare_contracts,
    contract_from_json,
    contract_to_json,
    infer_contract,
    infer_profile,
    summarize_violations,
    table_contract_from_json,
    validate_contract,
    validate_table_contract,
    violation_rows,
)
from .sources import FileManifestStore, load_table
from .operators.table_validate import run_resumable_validation

__all__ = ["main"]


def _spark(app: str):
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName(app).getOrCreate()


def _minhash_pairs(dd, df, text_col, id_col, threshold, shingle_size=3):
    """MinHash LSH candidates -> exact-jaccard verified pairs: the
    shared pipeline behind `dedup --method near` and `near-dedup --mode
    minhash` (one implementation, two CLI surfaces)."""
    return dd.jaccard_verify(
        df,
        dd.minhash_lsh_candidates(
            df, text_col=text_col, id_col=id_col, shingle_size=shingle_size
        ),
        text_col=text_col,
        id_col=id_col,
        shingle_size=shingle_size,
        threshold=threshold,
    )


def _minhash_keep_first(dd, df, text_col, id_col, threshold, shingle_size=3):
    """:func:`_minhash_pairs` resolved to the min-id survivors."""
    return dd.deduplicate_near(
        df,
        _minhash_pairs(dd, df, text_col, id_col, threshold, shingle_size),
        id_col=id_col,
    )


def _issues_json(result) -> dict:
    return {
        "ok": result.ok,
        "n_issues": len(result.issues),
        "issues": [
            {
                "kind": i.kind,
                "column": i.column,
                "message": i.message,
                "observed": str(i.observed),
                "expected": str(i.expected),
            }
            for i in result.issues
        ],
    }


def main(argv: Optional[list] = None) -> int:
    ap = argparse.ArgumentParser(prog="dsci_524_g26_data_validation_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("infer")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--max-categories", type=int, default=1000)
    p.add_argument(
        "--profile",
        action="store_true",
        help="include full P6 stats (row count, non-null counts, "
        "approx-distinct, p25/p50/p75) in the JSON report",
    )

    p = sub.add_parser("validate")
    p.add_argument("--input", required=True)
    p.add_argument("--contract", required=True)
    p.add_argument("--no-strict", action="store_true")
    p.add_argument("--violations-out")
    p.add_argument("--fail", action="store_true")
    p.add_argument("--top-k", type=int, default=5)

    p = sub.add_parser("table-validate")
    p.add_argument("--input", required=True)
    p.add_argument("--table-contract", required=True)
    p.add_argument("--reference")
    p.add_argument("--dim", action="append", default=[], metavar="NAME=SOURCE")
    p.add_argument("--resume-manifest")
    p.add_argument("--partition-col")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--fail", action="store_true")

    p = sub.add_parser("compare")
    p.add_argument("--old", required=True)
    p.add_argument("--new", required=True)

    p = sub.add_parser("dedup")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--method", choices=("exact", "near"), default="exact")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--threshold", type=float, default=0.7)

    p = sub.add_parser("near-dedup")
    p.add_argument("--input", required=True)
    # not required: --init-index only writes the index, never --output
    p.add_argument("--output")
    p.add_argument(
        "--mode",
        choices=("minhash", "containment", "semantic", "incremental"),
        default="minhash",
    )
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--threshold", type=float, default=None)
    p.add_argument("--shingle-size", type=int, default=3)
    p.add_argument("--max-df", type=int, default=50)
    p.add_argument("--keep", choices=("first", "best"), default="first")
    p.add_argument("--metric-col", default=None)
    p.add_argument("--verify", choices=("jaccard", "edit"), default="jaccard")
    p.add_argument("--index-dir", default=None)
    p.add_argument("--init-index", action="store_true")
    p.add_argument("--update-index", action="store_true")

    p = sub.add_parser("decontaminate")
    p.add_argument("--input", required=True)
    p.add_argument("--benchmark", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--ngram", type=int, default=13)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--bench-text-col", default="text")
    p.add_argument("--bench-id-col", default="bench_id")

    p = sub.add_parser("quarantine")
    p.add_argument("--input", required=True)
    p.add_argument("--contract", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--fail", action="store_true")

    p = sub.add_parser("strip-lines")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    g = p.add_mutually_exclusive_group()  # the thresholds contradict
    g.add_argument("--min-doc-frac", type=float)
    g.add_argument("--min-docs", type=int)
    p.add_argument("--min-line-chars", type=int, default=1)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")

    p = sub.add_parser("skew")
    p.add_argument("--input", required=True)
    p.add_argument("--key", required=True, help="column, or comma-list")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--salt-target", type=float, default=2.0)

    p = sub.add_parser("heavy-hitters")
    p.add_argument("--input", required=True)
    p.add_argument("--key", required=True)
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--min-count", type=int)
    g.add_argument("--min-share", type=float)
    p.add_argument("--safety", type=float, default=2.0)

    p = sub.add_parser("canary")
    p.add_argument("--input", required=True)
    p.add_argument(
        "--canaries", required=True,
        help="path to a newline-delimited canary-string file",
    )
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument(
        "--fail", action="store_true",
        help="exit 1 if any canary leaked (n_docs > 0)",
    )

    p = sub.add_parser("gopher")
    p.add_argument("--input", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--group-col", default="source")
    p.add_argument(
        "--min-pass-frac", type=float, default=None,
        help="exit 1 if any group's pass_frac falls below this",
    )

    p = sub.add_parser("blocklist")
    p.add_argument("--input", required=True)
    p.add_argument("--lexicon", required=True, help="file, one word per line")
    p.add_argument("--text-col", default="text")
    p.add_argument("--group-col", default="source")
    p.add_argument(
        "--max-flagged-frac", type=float, default=None,
        help="exit 1 if any group's flagged_frac exceeds this",
    )

    p = sub.add_parser("template-leak")
    p.add_argument("--input", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--group-col", default="source")
    p.add_argument(
        "--markers", default=None,
        help="file of literal markers, one per line (default: built-ins)",
    )
    p.add_argument(
        "--fail", action="store_true",
        help="exit 1 if any marker hits any group",
    )

    p = sub.add_parser("span-census")
    p.add_argument("--input", required=True)
    p.add_argument("--tokens-col", default="tokens")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--group-col", default="source")
    p.add_argument("--k", type=int, default=25)
    p.add_argument("--sample-mod", type=int, default=1)

    p = sub.add_parser("split")
    p.add_argument("--input", required=True)
    p.add_argument(
        "--splits", required=True,
        help="name=weight comma-list, weights sum to 1",
    )
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--salt", default="")
    p.add_argument(
        "--content-col", default=None,
        help="run the exact cross-split leakage audit on this column",
    )
    p.add_argument("--output", default=None)

    p = sub.add_parser("curate")
    p.add_argument("--input", required=True)
    p.add_argument("--workdir", required=True,
                   help="manifest + sidecar + output root (per-stage resume "
                        "lives here; rerun with the same workdir/run-id to "
                        "resume)")
    p.add_argument("--run-id", default="curate")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--benchmark", help="decontamination corpus (table/path)")
    p.add_argument("--ngram", type=int, default=13)
    p.add_argument("--filter", action="append", default=[],
                   metavar="NAME=SQL_PREDICATE")
    p.add_argument("--splits", metavar="train=0.8,val=0.1,test=0.1")
    p.add_argument("--split-salt", default="")
    p.add_argument("--mixture", metavar="web=0.5,books=1.0",
                   help="per-group keep rates; unmentioned groups keep all")
    p.add_argument("--mixture-group-col", default="source")
    p.add_argument("--n-shards", type=int)

    p = sub.add_parser("join-preflight")
    p.add_argument("--left", required=True)
    p.add_argument("--right", required=True)
    p.add_argument("--keys", required=True, help="column, or comma-list")
    p.add_argument("--top-k", type=int, default=10)

    p = sub.add_parser("file-order")
    p.add_argument("--input", required=True)
    p.add_argument("--key", required=True)
    p.add_argument("--descending", action="store_true")
    p.add_argument(
        "--per-file", action="store_true",
        help="include one report row per file, worst sorted_frac first",
    )
    p.add_argument("--fail", action="store_true")

    p = sub.add_parser("partition-diff")
    p.add_argument("--left", required=True)
    p.add_argument("--right", required=True)
    p.add_argument("--partition-col", required=True)
    p.add_argument("--cols", default=None, help="comma-list; default: shared")
    p.add_argument(
        "--portable", action="store_true",
        help="md5 digests (cross-engine) instead of dual-seed xxhash",
    )

    p = sub.add_parser("suggest")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True, help="suggested contract JSON")
    p.add_argument("--budget", type=float, default=0.01)
    p.add_argument("--max-categories", type=int, default=1000)
    p.add_argument(
        "--approx", action="store_true",
        help="percentile_approx (bounded memory) instead of exact",
    )

    p = sub.add_parser("json-contract")
    p.add_argument("--input", required=True)
    p.add_argument("--col", default="props")
    p.add_argument(
        "--rules", required=True,
        help="JSON file: list of JsonFieldRule kwargs objects",
    )
    p.add_argument("--declared-only", action="store_true")
    p.add_argument("--id-col", default=None)
    p.add_argument("--violations-out", default=None)
    p.add_argument("--fail", action="store_true")

    p = sub.add_parser("interleave")
    p.add_argument("--input", required=True)
    p.add_argument("--shard-col", default="shard")
    p.add_argument("--order-col", required=True)
    p.add_argument("--source-col", default="source")

    p = sub.add_parser("datacard")
    p.add_argument("--input", required=True)
    p.add_argument("--text-col", default=None)
    p.add_argument("--id-col", default=None)
    p.add_argument("--source-col", default=None)
    p.add_argument("--output", default=None,
                   help="also write the card JSON to this path")

    args = ap.parse_args(argv)

    if args.cmd == "compare":  # driver-only: no SparkSession needed
        with open(args.old) as f:
            a = contract_from_json(f.read())
        with open(args.new) as f:
            b = contract_from_json(f.read())
        report = compare_contracts(a, b)
        d = dataclasses.asdict(report)
        d["has_drift"] = report.has_drift
        d = {
            k: (sorted(v) if isinstance(v, set) else v) for k, v in d.items()
        }
        print(json.dumps(d, sort_keys=True, default=list))
        return 0

    spark = _spark(f"dv-{args.cmd}")

    if args.cmd == "join-preflight":
        from .operators.joins import hot_join_keys, join_explosion_report

        keys = [k.strip() for k in args.keys.split(",")]
        left = load_table(spark, args.left)
        right = load_table(spark, args.right)
        def _plain(d: dict) -> dict:
            # decimal(38,0) cardinalities (overflow-safe in the engine)
            # become plain JSON ints — Python ints are unbounded
            import decimal

            return {
                k: int(v) if isinstance(v, decimal.Decimal) else v
                for k, v in d.items()
            }

        report = _plain(
            join_explosion_report(left, right, keys=keys).first().asDict()
        )
        hot = [
            _plain(r.asDict())
            for r in hot_join_keys(
                left, right, keys=keys, top_k=args.top_k
            ).collect()
        ]
        report["hot_keys"] = hot
        print(json.dumps(report, sort_keys=True, default=str))
        return 0

    if args.cmd == "file-order":
        from pyspark.sql import functions as F

        from .sources.files import file_order_census, file_order_summary

        census = file_order_census(
            load_table(spark, args.input),
            args.key,
            descending=args.descending,
        ).localCheckpoint()  # O(files) rows; read by summary + per-file
        report = file_order_summary(census).first().asDict()
        if args.per_file:
            report["files"] = [
                r.asDict()
                for r in census.orderBy(
                    F.asc_nulls_first("sorted_frac"), F.asc("file")
                ).collect()
            ]
        print(json.dumps(report, sort_keys=True, default=str))
        all_sorted = report["n_files"] == report["n_sorted_files"]
        return 0 if (all_sorted or not args.fail) else 1

    if args.cmd == "partition-diff":
        from .operators.rowdiff import partition_diff

        left = load_table(spark, args.left)
        right = load_table(spark, args.right)
        cols = (
            [c.strip() for c in args.cols.split(",")] if args.cols else None
        )
        rows = [
            r.asDict()
            for r in partition_diff(
                left,
                right,
                partition_col=args.partition_col,
                cols=cols,
                hash_fn="portable" if args.portable else "xxhash",
            ).orderBy("partition").collect()
        ]
        n_bad = sum(1 for r in rows if r["status"] != "match")
        print(json.dumps(
            {"partitions": rows, "n_partitions": len(rows),
             "n_not_matching": n_bad, "ok": n_bad == 0},
            sort_keys=True, default=str,
        ))
        return 0

    df = load_table(spark, args.input)

    if args.cmd == "datacard":
        # one-command dataset card: compose the engine's censuses into a
        # single JSON report — each section is one existing operator,
        # each a bounded number of fused jobs (infer_profile is the
        # module-level import — a local re-import here would shadow it
        # for the whole function, breaking the infer branch)
        prof = infer_profile(df)
        card: dict = {
            "n_rows": prof.n_rows,
            "n_columns": len(prof.columns),
            "columns": {
                col: {
                    "dtype": p_.dtype,
                    "null_frac": p_.null_frac,
                    "approx_distinct": p_.approx_distinct,
                    "min": p_.min_value,
                    "max": p_.max_value,
                    "quantiles": (
                        list(p_.quantiles) if p_.quantiles else None
                    ),
                }
                for col, p_ in prof.columns.items()
            },
        }
        if args.source_col:
            from pyspark.sql import functions as SF

            shares = (
                df.groupBy(args.source_col)
                .agg(SF.count(SF.lit(1)).alias("n"))
                .orderBy(SF.desc("n"))
                .limit(50)
                .collect()
            )
            total = prof.n_rows or 1
            card["sources"] = [
                {"source": r[args.source_col], "n_rows": r["n"],
                 "share": round(r["n"] / total, 6)}
                for r in shares
            ]
        if args.text_col:
            from pyspark.sql import functions as SF

            from .operators.text import (
                char_entropy_expr,
                quality_score_expr,
                token_count_expr,
            )

            t = SF.col(args.text_col)
            row = df.agg(
                SF.round(SF.avg(SF.length(t)), 2).alias("avg_chars"),
                SF.round(SF.avg(token_count_expr(t)), 2).alias("avg_words"),
                SF.round(SF.avg(quality_score_expr(t)), 4).alias(
                    "avg_quality"
                ),
                SF.round(SF.avg(char_entropy_expr(t)), 4).alias(
                    "avg_char_entropy"
                ),
                SF.count_if(t.isNull() | (SF.length(t) == 0)).alias(
                    "n_empty"
                ),
            ).collect()[0]
            card["text"] = {k: row[k] for k in row.asDict()}
            # dedup estimate needs only the text digest — no id column
            from .operators.dedup import content_digest_expr

            dup = df.agg(
                SF.count(t).alias("n"),
                SF.approx_count_distinct(
                    content_digest_expr([args.text_col])
                ).alias("approx_distinct_texts"),
            ).collect()[0]
            n = int(dup["n"])
            distinct = int(dup["approx_distinct_texts"])
            card["dedup"] = {
                "n_texts": n,
                "approx_distinct_texts": distinct,
                # guard only the division: an empty corpus has a dup
                # fraction of 0.0, not 1.0
                "approx_exact_dup_frac": (
                    round(max(0.0, 1.0 - distinct / n), 6) if n else 0.0
                ),
            }
        out_json = json.dumps(card, sort_keys=True, default=str)
        if args.output:
            with open(args.output, "w") as f:
                f.write(out_json)
        print(out_json)
        return 0

    if args.cmd == "suggest":
        from .operators.advisor import suggest_contract_and_bounds

        # one quantile + violation pass feeds BOTH the written contract
        # and the printed report — they can never observe different
        # snapshots of a concurrently-written table
        contract, bounds = suggest_contract_and_bounds(
            df,
            violation_budget=args.budget,
            max_categories=args.max_categories,
            approx=args.approx,
        )
        with open(args.output, "w") as f:
            f.write(contract_to_json(contract, indent=2))
        numeric = [r.asDict() for r in bounds.collect()]
        print(json.dumps(
            {"written": args.output, "n_columns": len(contract.columns),
             "violation_budget": args.budget, "bounds": numeric},
            sort_keys=True,
        ))
        return 0

    if args.cmd == "json-contract":
        from .operators.json_contract import (
            JsonFieldRule,
            json_contract_report,
            json_contract_violations,
        )

        with open(args.rules) as f:
            specs = json.load(f)
        rules = [
            JsonFieldRule(
                **{
                    **spec,
                    **(
                        {"allowed": tuple(spec["allowed"])}
                        if spec.get("allowed") is not None
                        else {}
                    ),
                }
            )
            for spec in specs
        ]
        rows = [
            r.asDict()
            for r in json_contract_report(
                df, rules, col=args.col, declared_only=args.declared_only
            ).collect()
        ]
        out = {"report": rows,
               "ok": all(r["n_violations"] == 0 for r in rows)}
        if args.violations_out and not out["ok"]:
            if not args.id_col:
                raise SystemExit("--violations-out requires --id-col")
            json_contract_violations(
                df, rules, [args.id_col], col=args.col
            ).write.mode("overwrite").parquet(args.violations_out)
            out["violations_path"] = args.violations_out
        print(json.dumps(out, sort_keys=True))
        return 0 if (out["ok"] or not args.fail) else 1

    if args.cmd == "interleave":
        from .operators.interleave import interleaving_census

        rows = [
            r.asDict()
            for r in interleaving_census(
                df,
                shard_col=args.shard_col,
                order_col=args.order_col,
                source_col=args.source_col,
            ).collect()
        ]
        print(json.dumps({"shards": rows, "n_shards": len(rows)},
                         sort_keys=True, default=str))
        return 0

    if args.cmd == "infer":
        if args.profile:
            prof = infer_profile(df, max_categories=args.max_categories)
            contract = prof.contract
        else:
            prof = None
            contract = infer_contract(df, max_categories=args.max_categories)
        with open(args.output, "w") as f:
            f.write(contract_to_json(contract, indent=2))
        out = {"written": args.output, "n_columns": len(contract.columns)}
        if prof is not None:
            out["n_rows"] = prof.n_rows
            out["profile"] = {
                col: {
                    "dtype": p.dtype,
                    "null_frac": p.null_frac,
                    "non_null_count": p.non_null_count,
                    "approx_distinct": p.approx_distinct,
                    "min": p.min_value,
                    "max": p.max_value,
                    "quantiles": list(p.quantiles) if p.quantiles else None,
                }
                for col, p in prof.columns.items()
            }
        print(json.dumps(out, sort_keys=True))
        return 0

    if args.cmd == "validate":
        with open(args.contract) as f:
            contract = contract_from_json(f.read())
        result = validate_contract(df, contract, strict=not args.no_strict)
        out = _issues_json(result)
        summary = summarize_violations(result, top_k=args.top_k)
        out["counts_by_kind"] = summary.counts_by_kind
        if args.violations_out and not result.ok:
            violation_rows(df, contract).write.mode("overwrite").parquet(
                args.violations_out
            )
            out["violations_path"] = args.violations_out
        print(json.dumps(out, sort_keys=True))
        return 0 if (result.ok or not args.fail) else 1

    if args.cmd == "dedup":
        from .operators import dedup as dd

        n_in = df.count()
        if args.method == "exact":
            kept = dd.deduplicate_exact(
                df, cols=(args.text_col,), id_col=args.id_col
            )
        else:
            # same pipeline as `near-dedup --mode minhash --keep first`
            # (that subcommand is the full near-dup menu; this branch
            # stays for back-compat and delegates to the shared helper
            # so the two surfaces cannot drift)
            kept = _minhash_keep_first(
                dd, df, args.text_col, args.id_col, args.threshold
            )
        kept.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        print(json.dumps({
            "method": args.method, "rows_in": n_in, "rows_out": n_out,
            "rows_dropped": n_in - n_out, "written": args.output,
        }, sort_keys=True))
        return 0

    if args.cmd == "near-dedup":
        # one subcommand, four near-dup engines: MinHash LSH (with
        # jaccard or edit-similarity verify and first/best survivor
        # election), asymmetric containment (quote/subset pairs — pass
        # --keep best so the CONTAINER survives), SemDeDup semantic
        # dedup over an embedding column, and index-backed incremental
        # ingest dedup (--init-index builds the persisted index;
        # --update-index appends the admitted batch to it)
        from pyspark.sql import functions as SF

        from .operators import dedup as dd

        # mode/flag validation: refuse silently-ignored flags, and
        # require --output only when something will be written there
        if not args.init_index and not args.output:
            raise SystemExit("--output is required unless --init-index")
        if args.mode in ("semantic", "incremental") and (
            args.keep != "first"
            or args.verify != "jaccard"
            or args.metric_col
        ):
            raise SystemExit(
                f"--keep/--verify/--metric-col do not apply to "
                f"--mode {args.mode}"
            )
        if args.mode == "containment" and args.verify != "jaccard":
            raise SystemExit("--verify does not apply to --mode containment")

        def thr(default: float) -> float:
            # explicit --threshold 0 is a real request (keep every
            # candidate), not "use the default"
            return args.threshold if args.threshold is not None else default

        n_in = df.count()
        summary = {"mode": args.mode, "rows_in": n_in}

        if args.mode == "incremental":
            from .operators import incremental as inc

            if not args.index_dir:
                raise SystemExit("--mode incremental requires --index-dir")
            bands_path = f"{args.index_dir}/bands"
            hashes_path = f"{args.index_dir}/hashes"
            if args.init_index:
                inc.minhash_index(
                    df, text_col=args.text_col, id_col=args.id_col,
                    shingle_size=args.shingle_size,
                ).write.mode("overwrite").parquet(bands_path)
                inc.shingle_hash_index(
                    df, text_col=args.text_col, id_col=args.id_col,
                    shingle_size=args.shingle_size,
                ).write.mode("overwrite").parquet(hashes_path)
                print(json.dumps({
                    "mode": args.mode, "indexed": n_in,
                    "index_dir": args.index_dir,
                }, sort_keys=True))
                return 0
            kept = inc.admit_batch(
                df,
                spark.read.parquet(bands_path),
                spark.read.parquet(hashes_path),
                text_col=args.text_col,
                id_col=args.id_col,
                index_id_col=args.id_col,
                shingle_size=args.shingle_size,
                threshold=thr(0.5),
            )
        elif args.mode == "semantic":
            from .operators import similarity as sim

            kept = sim.semantic_deduplicate(
                df, vec_col=args.vec_col, id_col=args.id_col,
                threshold=thr(0.95),
            )
        else:
            if args.mode == "containment":
                pairs = dd.containment_pairs(
                    df, text_col=args.text_col, id_col=args.id_col,
                    shingle_size=args.shingle_size,
                    threshold=thr(0.8), max_df=args.max_df,
                ).select("id_a", "id_b")
            else:  # minhash
                if args.verify == "edit":
                    cand = dd.minhash_lsh_candidates(
                        df, text_col=args.text_col, id_col=args.id_col,
                        shingle_size=args.shingle_size,
                    )
                    pairs = dd.edit_similarity_verify(
                        df, cand, text_col=args.text_col,
                        id_col=args.id_col,
                        threshold=thr(0.8),
                    )
                else:
                    pairs = _minhash_pairs(
                        dd, df, args.text_col, args.id_col, thr(0.7),
                        args.shingle_size,
                    )
                summary["verify"] = args.verify
            if args.keep == "best":
                metric, src = args.metric_col, df
                if metric is None:
                    # default quality metric: text length (the longer
                    # member survives — for containment that is the
                    # containing document)
                    metric = "_metric"
                    src = df.withColumn(
                        metric, SF.length(SF.col(f"`{args.text_col}`"))
                    )
                kept = dd.deduplicate_near_best(
                    src, pairs, id_col=args.id_col, metric_col=metric
                )
                if args.metric_col is None:
                    kept = kept.drop("_metric")
            else:
                kept = dd.deduplicate_near(df, pairs, id_col=args.id_col)
            summary["keep"] = args.keep

        kept.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        summary.update({
            "rows_out": n_out, "rows_dropped": n_in - n_out,
            "written": args.output,
        })
        if args.mode == "incremental" and args.update_index:
            admitted = spark.read.parquet(args.output)
            inc.minhash_index(
                admitted, text_col=args.text_col, id_col=args.id_col,
                shingle_size=args.shingle_size,
            ).write.mode("append").parquet(bands_path)
            inc.shingle_hash_index(
                admitted, text_col=args.text_col, id_col=args.id_col,
                shingle_size=args.shingle_size,
            ).write.mode("append").parquet(hashes_path)
            summary["index_updated"] = True
        print(json.dumps(summary, sort_keys=True))
        return 0

    if args.cmd == "decontaminate":
        from .operators import contamination as ct

        bench = load_table(spark, args.benchmark)
        n_in = df.count()
        clean = ct.decontaminate(
            df, bench, text_col=args.text_col, id_col=args.id_col,
            bench_text_col=args.bench_text_col,
            bench_id_col=args.bench_id_col, n=args.ngram,
        )
        clean.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        print(json.dumps({
            "rows_in": n_in, "rows_out": n_out,
            "rows_contaminated": n_in - n_out, "ngram": args.ngram,
            "written": args.output,
        }, sort_keys=True))
        return 0

    if args.cmd == "quarantine":
        from .operators.quarantine import write_quarantine

        with open(args.contract) as f:
            contract = contract_from_json(f.read())
        report = write_quarantine(
            df, contract, args.output, mode="overwrite"
        )
        print(json.dumps({**report, "written": args.output}, sort_keys=True))
        return 0 if (report["n_quarantined"] == 0 or not args.fail) else 1

    if args.cmd == "strip-lines":
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        from .operators.lines import strip_frequent_lines

        # ONE strip pipeline: keep the original text alongside the
        # rewrite, ride the report metrics on the write job via
        # Observation (the quarantine-command pattern) — running
        # line_strip_report separately would rebuild the whole census/
        # strip plan a second time from the raw input
        stripped = strip_frequent_lines(
            df,
            text_col=args.text_col,
            id_col=args.id_col,
            min_docs=args.min_docs,
            min_doc_frac=(
                args.min_doc_frac if args.min_doc_frac is not None
                else (None if args.min_docs is not None else 0.01)
            ),
            min_line_chars=args.min_line_chars,
            out_col="__stripped",
            dropped_col="n_lines_dropped",
        )
        obs = Observation()
        observed = stripped.observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("n_lines_dropped") > 0).alias("n_docs_changed"),
            F.sum("n_lines_dropped").alias("n_lines_dropped"),
            F.sum(F.length(F.col(args.text_col))).alias("chars_before"),
            F.sum(F.length(F.col("__stripped"))).alias("chars_after"),
        )
        out_df = observed.drop(args.text_col).withColumnRenamed(
            "__stripped", args.text_col
        )
        out_df.write.mode("overwrite").parquet(args.output)
        # SUM over zero rows is SQL NULL: an empty input partition (a
        # normal backfill case) must still produce the JSON report, not
        # a TypeError after the write already succeeded
        rep = {k: int(v) if v is not None else 0 for k, v in obs.get.items()}
        print(json.dumps({**rep, "written": args.output}, sort_keys=True))
        return 0

    if args.cmd == "skew":
        from .operators.skew import key_skew_report, suggested_salt

        keys = [k.strip() for k in args.key.split(",")]
        rows = [
            r.asDict() for r in key_skew_report(df, keys, top_k=args.top_k).collect()
        ]
        top_skew = rows[0]["skew_factor"] if rows else 0.0
        print(json.dumps({
            "top_keys": rows,
            "max_skew_factor": top_skew,
            "suggested_salt": suggested_salt(top_skew, target=args.salt_target)
            if rows else 1,
        }, sort_keys=True, default=str))
        return 0

    if args.cmd == "heavy-hitters":
        from .operators.heavy import heavy_hitters

        rows = [
            r.asDict()
            for r in heavy_hitters(
                df,
                args.key,
                min_count=args.min_count,
                min_share=args.min_share,
                safety=args.safety,
            ).collect()
        ]
        print(json.dumps(
            {"heavy_hitters": rows, "n_keys": len(rows)},
            sort_keys=True, default=str,
        ))
        return 0

    if args.cmd == "canary":
        from .operators.contamination import canary_census

        with open(args.canaries) as fh:
            canaries = [ln.rstrip("\n") for ln in fh if ln.strip()]
        rows = [
            r.asDict()
            for r in canary_census(
                df, canaries, text_col=args.text_col, id_col=args.id_col
            ).orderBy("canary").collect()
        ]
        n_leaked = sum(1 for r in rows if r["n_docs"] > 0)
        print(json.dumps(
            {"canaries": rows, "n_canaries": len(rows),
             "n_leaked": n_leaked, "ok": n_leaked == 0},
            sort_keys=True, default=str,
        ))
        return 0 if (n_leaked == 0 or not args.fail) else 1

    if args.cmd == "gopher":
        from .operators.quality_rules import gopher_census

        rows = [
            r.asDict()
            for r in gopher_census(
                df, text_col=args.text_col, group_col=args.group_col
            ).orderBy(args.group_col).collect()
        ]
        low = [
            r[args.group_col]
            for r in rows
            if args.min_pass_frac is not None
            and r["pass_frac"] < args.min_pass_frac
        ]
        print(json.dumps(
            {"groups": rows, "n_groups": len(rows),
             "below_threshold": low, "ok": not low},
            sort_keys=True, default=str,
        ))
        return 0 if not low else 1

    if args.cmd == "blocklist":
        from .operators.lexicon import blocklist_census

        with open(args.lexicon) as fh:
            words = [ln.strip() for ln in fh if ln.strip()]
        rows = [
            r.asDict()
            for r in blocklist_census(
                df, text_col=args.text_col, words=words,
                group_by=args.group_col,
            ).orderBy("group").collect()
        ]
        over = [
            r["group"]
            for r in rows
            if args.max_flagged_frac is not None
            and r["flagged_frac"] > args.max_flagged_frac
        ]
        print(json.dumps(
            {"groups": rows, "n_groups": len(rows), "n_words": len(words),
             "over_threshold": over, "ok": not over},
            sort_keys=True, default=str,
        ))
        return 0 if not over else 1

    if args.cmd == "template-leak":
        from .operators.lexicon import TEMPLATE_MARKERS, template_leak_census

        if args.markers:
            # rstrip('\r\n'), not strip(): CRLF files must not leave a
            # stray '\r' on every marker (the gate would silently never
            # fire), but intentional leading/trailing spaces in a marker
            # like '### Response:' + ' ' stay significant
            with open(args.markers) as fh:
                markers = [ln.rstrip("\r\n") for ln in fh if ln.strip()]
        else:
            markers = list(TEMPLATE_MARKERS)
        rows = [
            r.asDict()
            for r in template_leak_census(
                df, text_col=args.text_col, markers=markers,
                group_by=args.group_col,
            ).orderBy("group", "marker").collect()
        ]
        n_hit = sum(1 for r in rows if r["n_docs_hit"] > 0)
        print(json.dumps(
            {"cells": rows, "n_markers": len(markers),
             "n_cells_hit": n_hit, "ok": n_hit == 0},
            sort_keys=True, default=str,
        ))
        return 0 if (n_hit == 0 or not args.fail) else 1

    if args.cmd == "span-census":
        from .operators.spans import span_duplication_census

        rows = [
            r.asDict()
            for r in span_duplication_census(
                df,
                group_col=args.group_col,
                id_col=args.id_col,
                tokens_col=args.tokens_col,
                k=args.k,
                sample_mod=args.sample_mod,
            ).orderBy(args.group_col).collect()
        ]
        print(json.dumps({
            "k": args.k, "sample_mod": args.sample_mod, "groups": rows,
        }, sort_keys=True))
        return 0

    if args.cmd == "curate":
        from .operators.curate import curate

        def _rates(spec):
            out = {}
            for kv in spec.split(","):
                k, v = kv.split("=", 1)
                out[k.strip()] = float(v)
            return out

        res = curate(
            df,
            workdir=args.workdir,
            run_id=args.run_id,
            id_col=args.id_col,
            text_col=args.text_col,
            dedup=not args.no_dedup,
            benchmark=(
                load_table(spark, args.benchmark) if args.benchmark else None
            ),
            contamination_ngram=args.ngram,
            filters=[tuple(f.split("=", 1)) for f in args.filter] or None,
            splits=_rates(args.splits) if args.splits else None,
            split_salt=args.split_salt,
            mixture=_rates(args.mixture) if args.mixture else None,
            mixture_group_col=args.mixture_group_col,
            n_shards=args.n_shards,
        )
        print(json.dumps({
            "report": res.report,
            "resumed_stages": res.resumed_stages,
            "output": res.output_path,
        }, sort_keys=True, default=str))
        return 0

    if args.cmd == "split":
        from pyspark.sql import functions as F

        from .operators.splits import (
            assign_splits,
            split_census,
            split_leakage,
        )

        splits = {}
        for spec in args.splits.split(","):
            name, w = spec.split("=", 1)
            splits[name.strip()] = float(w)
        census = [
            r.asDict()
            for r in split_census(
                df, splits, id_col=args.id_col, salt=args.salt
            ).orderBy("split").collect()
        ]
        out = {"splits": splits, "census": census}
        if args.content_col:
            leaks = split_leakage(
                df, splits, id_col=args.id_col,
                content_col=args.content_col, salt=args.salt,
            )
            agg = leaks.agg(
                F.count(F.lit(1)).alias("groups"),
                F.coalesce(F.sum("n_docs"), F.lit(0)).alias("docs"),
            ).first()
            out["leakage"] = {
                "leaked_content_groups": agg["groups"],
                "leaked_docs": agg["docs"],
            }
        if args.output:
            assign_splits(
                df, splits, id_col=args.id_col, salt=args.salt
            ).write.partitionBy("split").mode("overwrite").parquet(args.output)
            out["written"] = args.output
        print(json.dumps(out, sort_keys=True, default=str))
        return 0

    # table-validate
    with open(args.table_contract) as f:
        tc = table_contract_from_json(f.read())
    dims = {}
    for spec in args.dim:
        name, src = spec.split("=", 1)
        dims[name] = load_table(spark, src)
    ref = load_table(spark, args.reference) if args.reference else None
    if args.resume_manifest:
        if not args.partition_col:
            ap.error("--resume-manifest requires --partition-col")
        manifest = FileManifestStore(args.resume_manifest, run_id=args.run_id)
        ran = run_resumable_validation(
            df, tc, partition_col=args.partition_col, manifest=manifest,
            dims=dims, reference=ref,
        )
        ok = all(m["ok"] for m in ran.values()) if ran else True
        print(json.dumps({"partitions_ran": ran, "ok": ok}, sort_keys=True))
        return 0 if (ok or not args.fail) else 1
    result = validate_table_contract(df, tc, dims=dims, reference=ref)
    print(json.dumps(_issues_json(result), sort_keys=True))
    return 0 if (result.ok or not args.fail) else 1


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
