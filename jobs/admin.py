#!/usr/bin/env python3
"""spark-submit entrypoint: index administration.

    spark-submit --py-files textindex_spark.zip jobs/admin.py \
        --index /path/to/index (--describe | --delete 'url-glob' |
                                --delete-before ISO_TS |
                                --compact | --append INPUT_PARQUET [--upsert] |
                                --purge | --versions | --rollback V |
                                --expire KEEP_LAST [--min-age-sec S] |
                                --backfill-range-ts |
                                --merge SHARD1 SHARD2 ... [--remap-ids]
                                        [--latest-per-url] [--range-bits N]
                                [--dry-run])

Mirrors the reference's `stats` / `delete` commands
(``/root/reference/src/main.rs:277-347``; `delete` is a stub there)
plus the engine's compaction and incremental append. Every mutating
operation commits atomically through the versioned manifest.
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--describe", action="store_true")
    ap.add_argument("--delete", default=None, metavar="URL_GLOB")
    ap.add_argument(
        "--delete-before", default=None, metavar="ISO_TS",
        help="retention delete: tombstone docs with warc_ts strictly "
        "before this ISO-8601 UTC instant (null fetch times kept); "
        "physically reclaimed by --purge",
    )
    ap.add_argument("--compact", action="store_true")
    ap.add_argument(
        "--purge", action="store_true",
        help="physically remove tombstoned docs (rewrite from the "
        "segments log; atomic swap; drops the deleted table)",
    )
    ap.add_argument("--append", default=None, metavar="INPUT_PARQUET")
    ap.add_argument(
        "--upsert", action="store_true",
        help="with --append: re-crawl semantics — live docs whose url "
        "matches an incoming url are tombstoned in the same atomic "
        "commit that adds the new versions",
    )
    ap.add_argument(
        "--versions", action="store_true",
        help="print the snapshot history (version, table dir counts, props)",
    )
    ap.add_argument(
        "--rollback", type=int, default=None, metavar="V",
        help="roll back to snapshot V (commits a new manifest; "
        "nothing is deleted)",
    )
    ap.add_argument(
        "--expire", type=int, default=None, metavar="KEEP_LAST",
        help="retention maintenance: drop snapshots older than the "
        "KEEP_LAST newest and delete their superseded data dirs plus "
        "aged-out orphan staging dirs (Iceberg expire-snapshots + "
        "remove-orphan-files)",
    )
    ap.add_argument(
        "--min-age-sec", type=float, default=86400.0,
        help="with --expire: only remove never-committed staging "
        "orphans older than this (guards in-flight writers)",
    )
    ap.add_argument(
        "--backfill-range-ts", action="store_true",
        help="upgrade op: derive the per-range crawl-time bounds "
        "table for a pre-upgrade index (enables ts:FROM..TO range "
        "pruning without a rebuild; atomic, idempotent)",
    )
    ap.add_argument(
        "--dry-run", action="store_true",
        help="with --expire: report what would be removed, delete nothing",
    )
    ap.add_argument(
        "--merge", nargs="*", default=None, metavar="SHARD_DIR",
        help="physically merge ≥2 shard indexes into --index (which "
        "must be a NEW directory): tombstones dropped, postings "
        "re-encoded at --range-bits; the fresh-build-equivalent "
        "consolidation of a shard-per-crawl-month layout",
    )
    ap.add_argument(
        "--remap-ids", action="store_true",
        help="with --merge: offset colliding shards' doc_ids instead "
        "of erroring (urls stay the stable identity)",
    )
    ap.add_argument(
        "--latest-per-url", action="store_true",
        help="with --merge: keep only the newest snapshot per url "
        "(re-crawl overlap between shards)",
    )
    ap.add_argument("--range-bits", type=int, default=None)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    if not (args.describe or args.delete or args.delete_before
            or args.compact or args.append
            or args.purge or args.versions or args.rollback is not None
            or args.expire is not None or args.backfill_range_ts
            or args.merge is not None):
        ap.error("provide one of --describe / --delete / --delete-before / "
                 "--compact / --append / --purge / --versions / --rollback / "
                 "--expire / --backfill-range-ts / --merge")
    if args.merge is not None and len(args.merge) < 2:
        ap.error("--merge needs at least two shard directories")

    from textindex_spark.build import (
        append_batch,
        compact_postings,
        describe_index,
        purge_deleted,
    )
    from textindex_spark.query import delete_docs
    from textindex_spark.session import get_spark

    spark = get_spark("textindex-admin", cpus=args.cpus)
    out: dict = {}
    if args.merge is not None:
        from textindex_spark.build import RANGE_BITS_DEFAULT, merge_indexes

        out["merge"] = merge_indexes(
            spark, args.merge, args.index,
            range_bits=(
                args.range_bits if args.range_bits is not None
                else RANGE_BITS_DEFAULT
            ),
            on_id_conflict="remap" if args.remap_ids else "error",
            url_conflict="latest" if args.latest_per_url else "keep_all",
        )
    if args.append:
        docs = spark.read.parquet(args.append)
        out["append"] = append_batch(
            spark, docs, args.index, replace_by_url=args.upsert
        )
    if args.delete:
        out["deleted"] = delete_docs(spark, args.index, args.delete)
    if args.delete_before:
        from textindex_spark.query import delete_before

        out["deleted_before"] = delete_before(
            spark, args.index, args.delete_before
        )
    if args.compact:
        out["compacted_keys"] = compact_postings(spark, args.index)
    if args.backfill_range_ts:
        from textindex_spark.build import backfill_range_ts

        out["range_ts_rows"] = backfill_range_ts(spark, args.index)
    if args.purge:
        out["purged_docs"] = purge_deleted(spark, args.index)
    if args.rollback is not None:
        from textindex_spark import manifest
        from textindex_spark.query import invalidate_cache

        man = manifest.rollback(spark, args.index, args.rollback)
        invalidate_cache(args.index)
        out["rollback"] = {"new_version": man["version"], **man["props"]}
    if args.expire is not None:
        from textindex_spark import manifest

        out["expire"] = manifest.expire_snapshots(
            spark, args.index, keep_last=args.expire,
            min_age_sec=args.min_age_sec, dry_run=args.dry_run,
        )
    if args.versions:
        from textindex_spark import manifest

        out["versions"] = manifest.list_versions(spark, args.index)
    if args.describe:
        out["describe"] = describe_index(spark, args.index)
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
