"""spark-submit entry point for the reference's end-to-end wallet-
clustering workflow (run.py / services/wallet_clustering.py:51-65 /
cli/export_transactions.py): pairs in, per-community groups out.

    zip -qr engine.zip cryptowalletcommunitydetection_spark
    spark-submit --master <cluster> --py-files engine.zip \
        jobs/wallet_pipeline.py \
        --pairs-csv /data/0x38_wallets_pairs.csv --chain 0x38 \
        --out /out/groups --run-dir /ckpt/groups_run

    # or from a parquet pair table / the files-derivation path:
    spark-submit ... jobs/wallet_pipeline.py \
        --pairs-parquet /data/pairs --out /out/groups \
        --embeddings-out /out/vectors --dim 64

A user of the reference runs `get_groupp(df, chain)` over a pandas
frame; this job is that call re-expressed on the engine: CSV/parquet
pairs -> connected components (small-star/large-star, resumable via
--run-dir) -> per-community rollup with the user/deposit split and
deterministic group ids (sha-256 of the sorted member set — the uuid4
replacement, stable across reruns/resumes). --embeddings-out
additionally trains DeepWalk vectors over the same pair graph (walk
corpus -> Word2Vec) so communities can be compared / searched in
embedding space — the training-data extension of the workflow.

Output parquet mirrors the reference's document shape
(services/wallet_clustering.py:62-65): group_id, component,
user_wallets, deposit_wallets, edges, num_user, num_depo, chain.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pairs-csv",
                     help="reference-fixture CSV (index, x, y)")
    src.add_argument("--pairs-parquet",
                     help="parquet with from_address, to_address")
    ap.add_argument("--out", required=True, help="groups output parquet")
    ap.add_argument("--chain", default=None,
                    help="chain tag column (reference get_groupp)")
    ap.add_argument("--run-dir", default=None,
                    help="CC checkpoint/resume directory")
    ap.add_argument("--nsalt", type=int, default=None,
                    help="salted member-collect fan-out for skewed "
                         "communities")
    ap.add_argument("--embeddings-out", default=None,
                    help="also train DeepWalk vectors over the pair "
                         "graph; write (id, embedding) parquet here")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--num-walks", type=int, default=10)
    ap.add_argument("--walk-length", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    spark = (
        SparkSession.builder
        # defensive: unbounded explain strings OOMed a 1g driver on
        # deep iterative plans (see session.py); harmless if the
        # cluster config overrides it
        .config("spark.sql.maxPlanStringLength", str(8 * 1024 * 1024))
        .getOrCreate()
    )

    from cryptowalletcommunitydetection_spark.graph.rollup import (
        bipartite_group_rollup,
    )
    from cryptowalletcommunitydetection_spark.sources.files import (
        read_wallet_pairs_csv,
    )

    if args.pairs_csv:
        pairs = read_wallet_pairs_csv(spark, args.pairs_csv)
    else:
        pairs = spark.read.parquet(args.pairs_parquet).select(
            F.lower("from_address").alias("from_address"),
            F.lower("to_address").alias("to_address"),
        )

    groups = bipartite_group_rollup(
        spark, pairs, run_dir=args.run_dir, nsalt=args.nsalt
    )
    if args.chain is not None:
        groups = groups.withColumn("chain", F.lit(args.chain))
    groups.write.mode("overwrite").parquet(args.out)
    n_groups = spark.read.parquet(args.out).count()

    summary = {"out": args.out, "groups": n_groups, "chain": args.chain}

    if args.embeddings_out:
        from cryptowalletcommunitydetection_spark.graph.embeddings import (
            deepwalk_embeddings,
        )

        emb = deepwalk_embeddings(
            pairs.select(
                F.col("from_address").alias("src"),
                F.col("to_address").alias("dst"),
            ),
            dim=args.dim,
            num_walks=args.num_walks,
            walk_length=args.walk_length,
            seed=args.seed,
        )
        emb.write.mode("overwrite").parquet(args.embeddings_out)
        summary["vectors"] = spark.read.parquet(args.embeddings_out).count()

    print("JOB_SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
