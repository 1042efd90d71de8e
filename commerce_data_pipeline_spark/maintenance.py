"""Maintenance CLI: the offline, single-writer passes a long-lived
deployment schedules on a cadence (CLUSTER.md "Storage boundaries" /
"Ledger retention"). The ingest CLI (`cli.py`) mirrors the reference's
run_pipeline.py flag-for-flag; this module is the engine-side
operational surface the reference never needed (it had no persisted
indexes or cross-run ledgers to maintain):

    python -m commerce_data_pipeline_spark.maintenance index-compact \
        --path s3a://bucket/ivf
    python -m commerce_data_pipeline_spark.maintenance index-rebalance \
        --path .../ivf --max-list-size 50000 [--n-splits 2] \
        [--audit-sf-dir /root/testdata/sf0.1 --n-probe 4 --k 5 \
         --max-recall-drop-e6 50000]
    python -m commerce_data_pipeline_spark.maintenance index-recall-audit \
        --path .../ivf --audit-sf-dir ... [--n-probe 4 --k 5]
    python -m commerce_data_pipeline_spark.maintenance ledger-compact \
        --path .../ledger --kind fingerprint|band|gate \
        [--max-ids-per-key K] [--files-per-prefix N]

Every subcommand prints one JSON object and exits 0 on success.
`index-rebalance` with `--audit-sf-dir` measures recall@k at the FIXED
serving `--n-probe` before and after the split (`index.ivf_recall_audit`
— bit-identity holds only at n_probe ≥ the new centroid count, so the
fixed-probe delta is the number that prices the split); if the mean
recall drops by more than `--max-recall-drop-e6`, exit code is 1 — the
split still happened (it cannot be unsplit), but the operator is told
to raise n_probe or revisit max_list_size before the next pass. Two
r14 semantics (inherited from the library gate the CLI now delegates
to): a NO-OP pass (size census finds nothing oversized) skips the
audits and reports recall_pre/recall_post as null; an audit that
matches ZERO queries refuses BEFORE splitting (exit 1, index
unmutated).

Programmatic callers should use `operators.index.rebalance_with_gate`
(the library-level default path, r13 VERDICT #2) — same pre/post audit,
raising `RecallRegression` past the budget — and re-derive their serving
n_probe from `operators.index.recommended_n_probe` after every
maintenance window (the centroid_meta sidecar persists the routing
width so the scaled value survives across processes).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from commerce_data_pipeline_spark.session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="commerce-data-pipeline-spark-maintenance",
        description="offline maintenance passes: IVF index + dedup/gate ledgers",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    ic = sub.add_parser("index-compact", help="fold tombstones into the inverted file")
    ic.add_argument("--path", required=True)

    ir = sub.add_parser("index-rebalance", help="split oversized inverted lists")
    ir.add_argument("--path", required=True)
    ir.add_argument("--max-list-size", type=int, required=True)
    ir.add_argument("--n-splits", type=int, default=2)
    ir.add_argument("--audit-sf-dir", help="run the fixed-n_probe recall audit pre/post (reads <dir>/embeddings.parquet)")
    ir.add_argument("--n-probe", type=int, default=4)
    ir.add_argument("--k", type=int, default=5)
    ir.add_argument("--max-recall-drop-e6", type=int, default=None,
                    help="exit 1 if mean recall@k at the serving n_probe drops more than this")

    iv = sub.add_parser(
        "index-recover",
        help="resolve a pending rename-aside swap (crashed rebalance): "
             "roll the split back or commit it, then sweep unroutable "
             "debris — the executable form of check_no_pending_swap's "
             "guidance",
    )
    iv.add_argument("--path", required=True)
    iv.add_argument("--action", required=True, choices=["rollback", "commit"])

    ia = sub.add_parser("index-recall-audit", help="recall@k at fixed n_probe vs brute force")
    ia.add_argument("--path", required=True)
    ia.add_argument("--audit-sf-dir", required=True)
    ia.add_argument("--n-probe", type=int, default=4)
    ia.add_argument("--k", type=int, default=5)

    lc = sub.add_parser("ledger-compact", help="distinct-rewrite a ledger (rename-aside swap)")
    lc.add_argument("--path", required=True)
    lc.add_argument("--kind", required=True, choices=["fingerprint", "band", "gate"])
    lc.add_argument("--files-per-prefix", type=int, default=1)
    lc.add_argument("--max-ids-per-key", type=int, default=None,
                    help="band ledgers only: keep the k smallest doc_ids per band key")
    lc.add_argument("--n-bins", type=int, default=100, help="gate ledgers: bin config")
    lc.add_argument("--conf-scale", type=int, default=1_000_000, help="gate ledgers: bin config")
    return p


def _audit_corpus(spark, sf_dir: str):
    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    queries = emb.filter((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 2500))
    return emb, queries


def _recall(spark, path: str, sf_dir: str, k: int, n_probe: int) -> dict:
    from commerce_data_pipeline_spark.operators import index as ivf_index

    emb, queries = _audit_corpus(spark, sf_dir)
    row = ivf_index.ivf_recall_audit(
        spark, path, emb, queries, k=k, n_probe=n_probe
    ).collect()[0]
    return {c: row[c] for c in row.asDict()}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark("maintenance")
    from commerce_data_pipeline_spark.operators import index as ivf_index

    if args.cmd == "index-compact":
        ivf_index.compact_ivf_index(spark, args.path)
        print(json.dumps({"cmd": args.cmd, "path": args.path, "ok": True}))
        return 0

    if args.cmd == "index-recover":
        try:
            res = ivf_index.recover_pending_swap(spark, args.path, args.action)
        except RuntimeError as e:
            # refusals are actionable, not crashes: commit requested in
            # the mid-swap state (no promoted routing exists), or the
            # rename-aside copy survived its delete (nothing is swept
            # while a stale routing copy exists)
            print(json.dumps({
                "cmd": args.cmd, "path": args.path, "ok": False,
                "error": str(e),
            }))
            return 1
        print(json.dumps({
            "cmd": args.cmd, "path": args.path, "ok": True, **res,
        }))
        return 0

    if args.cmd == "index-recall-audit":
        out = _recall(spark, args.path, args.audit_sf_dir, args.k, args.n_probe)
        print(json.dumps({"cmd": args.cmd, "path": args.path, "audit": out}))
        return 0

    if args.cmd == "index-rebalance":
        if args.max_recall_drop_e6 is not None and not args.audit_sf_dir:
            # a gate without an audit corpus would silently never evaluate
            print(json.dumps({
                "cmd": args.cmd, "ok": False,
                "error": "--max-recall-drop-e6 requires --audit-sf-dir "
                         "(the gate needs a corpus to measure recall against)",
            }))
            return 2
        out = {"cmd": args.cmd, "path": args.path, "ok": True}
        if not args.audit_sf_dir:  # audit-free pass: raw rebalance
            out["split_centroids"] = ivf_index.rebalance_ivf_index(
                spark, args.path, max_list_size=args.max_list_size,
                n_splits=args.n_splits,
            )
            out["recommended_n_probe"] = ivf_index.recommended_n_probe(
                spark, args.path, args.n_probe
            )
            print(json.dumps(out))
            return 0
        # ONE gate implementation: the library-level default path
        # (rebalance_with_gate) — the CLI only maps its outcomes onto
        # JSON + exit codes (r14 review: the first cut duplicated the
        # pre/post audit + drop comparison here and had already drifted).
        emb, queries = _audit_corpus(spark, args.audit_sf_dir)
        try:
            res = ivf_index.rebalance_with_gate(
                spark, args.path, max_list_size=args.max_list_size,
                corpus=emb, queries=queries,
                max_recall_drop_e6=args.max_recall_drop_e6,  # None = report-only
                k=args.k, n_probe=args.n_probe, n_splits=args.n_splits,
            )
            out.update(
                split_centroids=res["split_centroids"],
                recall_pre=res["pre"],
                recall_post=res["post"],
                recommended_n_probe=res["recommended_n_probe"],
            )
        except ivf_index.RecallRegression as e:
            # the veto ROLLED the split back (r14 VERDICT #2): the index
            # serves pre-split results; split_centroids reports what the
            # vetoed pass WOULD have retired
            out.update(
                ok=False,
                split_centroids=e.split,
                recall_pre=e.pre,
                recall_post=e.post,
                recommended_n_probe=e.recommended_n_probe,
                rolled_back=True,
                recall_gate=str(e),
            )
        except ivf_index.UnevaluableGate as e:
            # dedicated type (r14 ADVICE): ONLY the zero-query refusal —
            # raised BEFORE the split, the index was not mutated; any
            # other ValueError from the audit internals propagates as the
            # error it is instead of masquerading as a gate outcome
            out.update(ok=False, recall_gate=str(e))
        print(json.dumps(out))
        return 0 if out["ok"] else 1

    if args.cmd == "ledger-compact":
        from commerce_data_pipeline_spark.sources.ledger import (
            BandLedger,
            FingerprintLedger,
            QualityGateLedger,
        )

        if args.kind == "fingerprint":
            FingerprintLedger(spark, args.path).compact(args.files_per_prefix)
        elif args.kind == "band":
            BandLedger(spark, args.path).compact(
                args.files_per_prefix, max_ids_per_key=args.max_ids_per_key
            )
        else:
            QualityGateLedger(
                spark, args.path, n_bins=args.n_bins, conf_scale=args.conf_scale
            ).compact()
        print(json.dumps({"cmd": args.cmd, "path": args.path,
                          "kind": args.kind, "ok": True}))
        return 0

    raise AssertionError(f"unhandled cmd {args.cmd!r}")  # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())
