"""spark-submit entry point for the graph algorithms (north-rule path).

Usage (``--py-files engine.zip`` carries the package to executors)::

    zip -qr engine.zip cryptowalletcommunitydetection_spark
    spark-submit --master <cluster> --py-files engine.zip jobs/run_graph.py \
        --algo pagerank --edges /data/edges_parquet --out /out/ranks \
        --run-dir /ckpt/pr_run            # resumable: re-running resumes

    spark-submit ... jobs/run_graph.py \
        --algo cc --files /data/files_parquet --out /out/components

Inputs are either a prebuilt canonical edge table (``--edges``: parquet
with src, dst[, weight]) or the Iceberg-style files table (``--files``:
(repo, path, commit, lang, content)) from which edges are derived via
the Arrow extraction pipeline. ``--resume`` is implicit: pointing
``--run-dir`` at a previous run's directory continues it (same
algorithm + parameters), per-superstep state and metrics live there.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", required=True,
                    choices=["pagerank", "cc", "lpa", "triangles", "rollup",
                             "kcore", "clustering", "linkpred", "modularity",
                             "bfs", "betweenness", "hyperball", "truss",
                             "walks", "embeddings", "hits"])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--edges", help="parquet path: src, dst[, weight]")
    src.add_argument("--files", help="files table: parquet path or Iceberg name")
    src.add_argument("--edge-log", help="EdgeLog root (incremental edge table)")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--run-dir", default=None, help="checkpoint/resume directory")
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=300)
    ap.add_argument("--weighted", action=argparse.BooleanOptionalAction, default=True,
                    help="--no-weighted ignores the weight column")
    ap.add_argument("--directed", action="store_true")
    ap.add_argument("--init-ranks", default=None,
                    help="pagerank only: parquet (id, rank) from a prior run; "
                         "warm-starts the iteration (same fixed point, fewer "
                         "supersteps after a small edge delta)")
    ap.add_argument("--seeds", default=None,
                    help="pagerank only: parquet (id, weight) — personalized "
                         "teleport (rank every vertex by seeded-random-walk "
                         "proximity to the seed set)")
    ap.add_argument("--labels", default=None,
                    help="modularity only: parquet (id, label) — the "
                         "partition to score (LPA/CC output)")
    ap.add_argument("--prior-labels", default=None,
                    help="cc only: parquet (id, component) from a prior run; "
                         "the input edge table is then treated as the DELTA "
                         "(additions only) and labels are re-converged via "
                         "condensation without reading the base edges")
    ap.add_argument("--truss-k", type=int, default=None,
                    help="truss only: peel to the k-truss edge set; omitted "
                         "-> write per-edge triangle support instead")
    ap.add_argument("--num-walks", type=int, default=10,
                    help="walks only: walks started per vertex")
    ap.add_argument("--walk-length", type=int, default=20,
                    help="walks only: vertices per walk")
    ap.add_argument("--p", type=float, default=1.0,
                    help="walks only: node2vec return parameter (p != 1 or "
                         "q != 1 switches to second-order biased walks)")
    ap.add_argument("--q", type=float, default=1.0,
                    help="walks only: node2vec in-out parameter")
    ap.add_argument("--dim", type=int, default=64,
                    help="embeddings only: vector size")
    ap.add_argument("--w2v-partitions", type=int, default=1,
                    help="embeddings only: Word2Vec training splits "
                         "(1 = bit-reproducible; >1 trades exact "
                         "reproducibility for fit parallelism)")
    ap.add_argument("--walk-seed", type=int, default=42,
                    help="walks only: hash seed (same seed -> same corpus)")
    ap.add_argument("--sample-p", type=float, default=None,
                    help="triangles only: DOULION edge-sampling probability "
                         "in (0, 1] — writes a one-row (estimate, p) parquet "
                         "instead of per-vertex counts (unbiased 1/p^3-scaled "
                         "count on the hash-sparsified graph)")
    args = ap.parse_args()

    # build_session is a no-op wrapper when spark-submit already created
    # the session (getOrCreate); configs come from --conf in that case
    spark = (
        SparkSession.builder
        # defensive: unbounded explain strings OOMed a 1g driver on
        # deep iterative plans (see session.py); harmless if the
        # cluster config overrides it
        .config("spark.sql.maxPlanStringLength", str(8 * 1024 * 1024))
        .getOrCreate()
    )

    from cryptowalletcommunitydetection_spark.graph.cc import connected_components
    from cryptowalletcommunitydetection_spark.graph.edges import derive_edges
    from cryptowalletcommunitydetection_spark.graph.lpa import label_propagation
    from cryptowalletcommunitydetection_spark.graph.pagerank import pagerank
    from cryptowalletcommunitydetection_spark.graph.rollup import bipartite_group_rollup
    from cryptowalletcommunitydetection_spark.graph.triangles import triangles_per_vertex
    from cryptowalletcommunitydetection_spark.sources.files import read_files

    if args.edges:
        edges = spark.read.parquet(args.edges)
        canonical = False  # arbitrary parquet: keep the defensive dedup
    elif args.edge_log:
        from cryptowalletcommunitydetection_spark.sources import EdgeLog

        edges = EdgeLog(spark, args.edge_log).read()
        if edges is None:
            raise SystemExit(f"edge log at {args.edge_log} is empty")
        canonical = True  # merged view keeps the canonical contract
    else:
        edges = derive_edges(read_files(spark, args.files))
        canonical = True  # derive_edges output contract: already canonical

    summary: dict = {"algo": args.algo, "out": args.out}
    if args.algo == "pagerank":
        init = spark.read.parquet(args.init_ranks) if args.init_ranks else None
        pers = spark.read.parquet(args.seeds) if args.seeds else None
        res = pagerank(
            spark, edges, alpha=args.alpha, tol=args.tol, max_iter=args.max_iter,
            weighted=args.weighted, directed=args.directed, run_dir=args.run_dir,
            assume_canonical=canonical and not args.directed, init_ranks=init,
            personalization=pers,
        )
        res.ranks.write.mode("overwrite").parquet(args.out)
        summary.update(supersteps=res.supersteps, converged=res.converged)
    elif args.algo == "cc":
        if args.prior_labels:
            from cryptowalletcommunitydetection_spark.graph.incremental import (
                incremental_components,
            )

            cc = incremental_components(
                spark, spark.read.parquet(args.prior_labels), edges,
                max_iter=args.max_iter,
            )
        else:
            cc = connected_components(
                spark, edges, max_iter=args.max_iter, run_dir=args.run_dir,
                assume_canonical=canonical,
            )
        cc.write.mode("overwrite").parquet(args.out)
    elif args.algo == "lpa":
        res = label_propagation(
            spark, edges, max_iter=min(args.max_iter, 50),
            weighted=args.weighted, directed=args.directed, run_dir=args.run_dir,
            assume_canonical=canonical and not args.directed,
        )
        res.labels.write.mode("overwrite").parquet(args.out)
        summary.update(supersteps=res.supersteps, converged=res.converged)
    elif args.algo == "triangles":
        if args.sample_p is not None:
            from cryptowalletcommunitydetection_spark.graph.triangles import (
                triangle_count_sampled,
            )

            est = triangle_count_sampled(
                edges, p=args.sample_p, assume_canonical=canonical
            )
            spark.createDataFrame(
                [(est, args.sample_p)], "triangles_estimate double, p double"
            ).write.mode("overwrite").parquet(args.out)
            summary.update(triangles_estimate=est, sample_p=args.sample_p)
        else:
            triangles_per_vertex(
                edges, assume_canonical=canonical
            ).write.mode("overwrite").parquet(args.out)
    elif args.algo == "kcore":
        from cryptowalletcommunitydetection_spark.graph.kcore import core_numbers

        res = core_numbers(
            spark, edges, max_iter=args.max_iter, run_dir=args.run_dir,
            assume_canonical=canonical,
        )
        res.cores.write.mode("overwrite").parquet(args.out)
        summary.update(supersteps=res.supersteps, converged=res.converged)
    elif args.algo == "rollup":
        from pyspark.sql import functions as F

        pairs = edges.select(
            F.col("src").alias("from_address"), F.col("dst").alias("to_address")
        )
        bipartite_group_rollup(spark, pairs).write.mode("overwrite").parquet(args.out)
    elif args.algo == "clustering":
        from cryptowalletcommunitydetection_spark.graph.triangles import (
            clustering_coefficient,
        )

        clustering_coefficient(
            edges, assume_canonical=canonical
        ).write.mode("overwrite").parquet(args.out)
    elif args.algo == "linkpred":
        from cryptowalletcommunitydetection_spark.graph.linkpred import (
            link_prediction_scores,
        )

        link_prediction_scores(
            edges, assume_canonical=canonical
        ).write.mode("overwrite").parquet(args.out)
    elif args.algo == "bfs":
        from cryptowalletcommunitydetection_spark.graph.paths import (
            multi_source_distances,
        )

        if not args.seeds:
            raise SystemExit("--algo bfs requires --seeds (parquet with id)")
        d = multi_source_distances(
            spark, edges, spark.read.parquet(args.seeds),
            directed=args.directed, assume_canonical=canonical,
        )
        d.write.mode("overwrite").parquet(args.out)
    elif args.algo == "betweenness":
        from cryptowalletcommunitydetection_spark.graph.centrality import (
            betweenness_from_sources,
        )

        if not args.seeds:
            raise SystemExit(
                "--algo betweenness requires --seeds (the sampled pivot set; "
                "scale results by n/|seeds| for the estimator)"
            )
        bc = betweenness_from_sources(
            spark, edges, spark.read.parquet(args.seeds),
            directed=args.directed, assume_canonical=canonical,
        )
        bc.write.mode("overwrite").parquet(args.out)
    elif args.algo == "hyperball":
        from cryptowalletcommunitydetection_spark.graph.hyperball import hyperball

        res = hyperball(
            spark, edges, max_r=args.max_iter, directed=args.directed,
            assume_canonical=canonical and not args.directed,
        )
        res.per_vertex.write.mode("overwrite").parquet(args.out)
        res.release()
        summary.update(
            supersteps=res.supersteps, converged=res.converged,
            avg_distance=round(res.avg_distance, 4),
            effective_diameter=round(res.effective_diameter, 4),
        )
    elif args.algo == "modularity":
        from cryptowalletcommunitydetection_spark.graph.quality import (
            modularity_by_community,
        )

        if not args.labels:
            raise SystemExit("--algo modularity requires --labels")
        per = modularity_by_community(
            edges, spark.read.parquet(args.labels),
            weighted=args.weighted, assume_canonical=canonical,
        )
        per.write.mode("overwrite").parquet(args.out)

    elif args.algo == "truss":
        from cryptowalletcommunitydetection_spark.graph.truss import (
            edge_support,
            k_truss,
        )

        if args.truss_k is not None:
            out = k_truss(edges, args.truss_k, assume_canonical=canonical)
            summary.update(k=args.truss_k, edges_kept=out.count())
        else:
            out = edge_support(edges, assume_canonical=canonical)
        out.write.mode("overwrite").parquet(args.out)
    elif args.algo == "walks":
        from cryptowalletcommunitydetection_spark.graph.walks import (
            node2vec_walks,
            random_walks,
        )

        seeds = spark.read.parquet(args.seeds) if args.seeds else None
        biased = args.p != 1.0 or args.q != 1.0
        if biased:
            corpus = node2vec_walks(
                edges,
                p=args.p,
                q=args.q,
                num_walks=args.num_walks,
                walk_length=args.walk_length,
                seed=args.walk_seed,
                assume_canonical=canonical,
                starts=seeds,
            )
        else:
            corpus = random_walks(
                edges,
                num_walks=args.num_walks,
                walk_length=args.walk_length,
                seed=args.walk_seed,
                assume_canonical=canonical,
                starts=seeds,
            )
        corpus.write.mode("overwrite").parquet(args.out)
        summary.update(
            num_walks=args.num_walks, walk_length=args.walk_length,
            seed=args.walk_seed, p=args.p, q=args.q,
        )
    elif args.algo == "hits":
        from cryptowalletcommunitydetection_spark.graph.hits import hits

        res = hits(
            spark, edges, tol=args.tol, max_iter=args.max_iter,
            directed=args.directed, assume_canonical=canonical,
        )
        res.scores.write.mode("overwrite").parquet(args.out)
        summary.update(supersteps=res.supersteps, converged=res.converged)
    elif args.algo == "embeddings":
        from cryptowalletcommunitydetection_spark.graph.embeddings import (
            deepwalk_embeddings,
        )

        seeds = spark.read.parquet(args.seeds) if args.seeds else None
        emb = deepwalk_embeddings(
            edges,
            dim=args.dim,
            num_walks=args.num_walks,
            walk_length=args.walk_length,
            seed=args.walk_seed,
            num_partitions=args.w2v_partitions,
            assume_canonical=canonical,
            starts=seeds,
        )
        emb.write.mode("overwrite").parquet(args.out)
        summary.update(
            dim=args.dim, num_walks=args.num_walks,
            walk_length=args.walk_length, seed=args.walk_seed,
            vectors=emb.count(),
        )

    print("JOB_SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
