"""spark-submit entry point for the engine's headline jobs.

Cluster launch (north_star launch mode):

    python tools/make_pyfiles.py            # → dist/dmid_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/dmid_spark.zip \
        tools/run_job.py pagerank --edges s3://bucket/edges_parquet \
        --output s3://bucket/ranks --tol 1e-6 --checkpoint s3://bucket/ckpt

In this sandbox the same file runs under ``spark-submit --master local[N]``
(exercised by tests/test_submit.py). The session comes from
``SparkSession.builder.getOrCreate()`` so spark-submit's ``--master`` /
``--conf`` flags govern; ``dmid_spark.session.get_spark`` is NOT used here
on purpose — submit owns the config on a real cluster.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="dmid_spark job runner")
    p.add_argument("job", choices=[
        "pagerank", "dmid", "rawlpa", "components", "corpus-edges",
        "scc", "kcore", "coreness", "hits", "ppr", "bfs", "harmonic", "walks",
        "betweenness", "sssp", "ktruss", "hyperball",
        "clean-corpus", "chunk-dedup", "decontaminate", "node2vec",
        "spectral-embed", "matching", "simjoin", "rmat",
    ])
    p.add_argument("--edges", help="parquet path of (src, dst, weight)")
    p.add_argument("--corpus", help="parquet/iceberg path of (repo, path, commit, lang, content)")
    p.add_argument("--output", required=True)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--mode", default="csr_rdd")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--variant", default="basic")
    p.add_argument("--k", type=int, default=3, help="kcore: the k")
    p.add_argument("--seeds", help="ppr/bfs/harmonic: parquet path of seed (id) rows")
    p.add_argument("--max-depth", type=int, default=None, help="bfs/harmonic depth cap")
    p.add_argument("--walk-length", type=int, default=10)
    p.add_argument("--seed", type=int, default=42, help="walks: hash seed")
    p.add_argument("--hll-p", type=int, default=6, help="hyperball: register precision")
    p.add_argument("--docs", help="text jobs: parquet path of (doc_id, text) rows")
    p.add_argument("--benchmark", help="decontaminate: parquet path of benchmark docs")
    p.add_argument("--chunk-words", type=int, default=20)
    p.add_argument("--ngram", type=int, default=13, help="decontaminate window")
    p.add_argument("--p", type=float, default=1.0, help="node2vec return bias")
    p.add_argument("--q", type=float, default=1.0, help="node2vec in-out bias")
    p.add_argument("--dim", type=int, default=32, help="node2vec embedding size")
    p.add_argument("--k-dims", type=int, default=8, help="spectral-embed block width")
    p.add_argument("--iterations", type=int, default=12, help="spectral-embed rounds")
    p.add_argument("--threshold", type=float, default=0.5, help="simjoin Jaccard t")
    p.add_argument("--shingle-n", type=int, default=3, help="simjoin shingle width")
    p.add_argument("--scale", type=int, default=20, help="rmat: log2 vertex count")
    p.add_argument("--n-edges", type=int, default=1_000_000, help="rmat edge draws")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"dmid_spark_{args.job}").getOrCreate()

    from dmid_spark.checkpoint import CheckpointManager

    ckpt = (
        CheckpointManager(spark, args.checkpoint, args.job) if args.checkpoint else None
    )
    stats: dict = {}

    if args.job == "rmat":
        from dmid_spark.io import rmat_edges

        out = rmat_edges(
            spark, scale=args.scale, n_edges=args.n_edges, seed=args.seed,
            collapse_duplicates=True,
        )
        out.write.mode("overwrite").parquet(args.output)
        stats = {"scale": args.scale, "edges": spark.read.parquet(args.output).count()}
    elif args.job == "simjoin":
        from dmid_spark.text import similarity_join

        docs = spark.read.parquet(args.docs)
        out = similarity_join(docs, threshold=args.threshold, n=args.shingle_n)
        out.write.mode("overwrite").parquet(args.output)
        stats = {"pairs": spark.read.parquet(args.output).count()}
    elif args.job in ("clean-corpus", "chunk-dedup", "decontaminate"):
        docs = spark.read.parquet(args.docs)
        if args.job == "clean-corpus":
            from dmid_spark.text import CleanCorpusParams, clean_corpus

            out = clean_corpus(docs, CleanCorpusParams())
        elif args.job == "chunk-dedup":
            from dmid_spark.text import chunk_dedup_summary

            out = chunk_dedup_summary(docs, chunk_words=args.chunk_words)
        else:
            from dmid_spark.text import decontaminate

            bench = spark.read.parquet(args.benchmark)
            out = decontaminate(docs, bench, n=args.ngram)
        out.write.mode("overwrite").parquet(args.output)
        stats = {"rows": spark.read.parquet(args.output).count()}
    elif args.job == "corpus-edges":
        from dmid_spark.corpus import build_edges, verify_sha256

        corpus = spark.read.parquet(args.corpus)
        if "content_sha" in corpus.columns:
            violations = verify_sha256(corpus)
            if violations:
                raise SystemExit(f"sha256 ingest invariant violated on {violations} rows")
            stats["sha_violations"] = 0
        edges, info = build_edges(corpus)
        edges.write.mode("overwrite").parquet(args.output)
        stats.update(info)
    else:
        edges = spark.read.parquet(args.edges)
        if args.job == "pagerank":
            from dmid_spark.algorithms import pagerank

            ranks, st = pagerank(
                edges, tol=args.tol, mode=args.mode, ckpt=ckpt, resume=args.resume
            )
            ranks.write.mode("overwrite").parquet(args.output)
            stats = {
                "iterations": st.iterations,
                "converged": st.converged,
                "supersteps_per_sec": round(st.supersteps_per_sec, 4),
                "edges_per_sec": round(st.edges_per_sec, 1),
            }
        elif args.job in ("dmid", "rawlpa"):
            from dmid_spark.algorithms import dmid, rawlpa, DmidParams

            if args.job == "rawlpa":
                res = rawlpa(edges, tol=args.tol, mode=args.mode)
            else:
                res = dmid(
                    edges,
                    DmidParams(tol=args.tol, mode=args.mode, variant=args.variant),
                    ckpt=ckpt,
                )
            res.cover.write.mode("overwrite").parquet(args.output)
            stats = {"leaders": len(res.leaders), "unassigned": res.unassigned,
                     **{k: v for k, v in res.stats.items() if k != "cascade"}}
        elif args.job == "components":
            from dmid_spark.algorithms import connected_components

            labels, st = connected_components(edges)
            labels.write.mode("overwrite").parquet(args.output)
            stats = {"rounds": st.rounds, "converged": st.converged}
        elif args.job == "scc":
            from dmid_spark.algorithms import strongly_connected_components

            labels, st = strongly_connected_components(edges)
            labels.write.mode("overwrite").parquet(args.output)
            stats = {"outer_rounds": st.outer_rounds, "converged": st.converged}
        elif args.job == "kcore":
            from dmid_spark.algorithms import kcore

            core, st = kcore(edges, k=args.k)
            core.write.mode("overwrite").parquet(args.output)
            stats = {"k": args.k, "rounds": st.rounds, "converged": st.converged}
        elif args.job == "ktruss":
            from dmid_spark.algorithms import ktruss

            truss, st = ktruss(edges, k=args.k)
            truss.write.mode("overwrite").parquet(args.output)
            stats = {"k": args.k, "rounds": st.rounds, "converged": st.converged}
        elif args.job == "hyperball":
            from dmid_spark.algorithms import effective_diameter, hyperball

            regs, st = hyperball(edges, radius=args.max_depth or 16, p=args.hll_p)
            regs.write.mode("overwrite").parquet(args.output)
            stats = {
                "rounds": st.rounds,
                "converged": st.converged,
                "nf_last": round(st.nf[-1], 1),
                "effective_diameter_90": round(effective_diameter(st.nf), 3),
            }
        elif args.job == "coreness":
            from dmid_spark.algorithms import coreness

            core, st = coreness(edges)
            core.write.mode("overwrite").parquet(args.output)
            stats = {"rounds": st.rounds, "converged": st.converged}
        elif args.job == "hits":
            from dmid_spark.algorithms import hits

            scores, st = hits(edges, tol=args.tol)
            scores.write.mode("overwrite").parquet(args.output)
            stats = {"iterations": st.iterations, "converged": st.converged}
        elif args.job in ("bfs", "harmonic", "betweenness", "sssp"):
            from dmid_spark.algorithms import (
                betweenness_sample,
                bfs_distances,
                harmonic_centrality,
                sssp,
            )

            seeds = spark.read.parquet(args.seeds)
            fn = {
                "bfs": bfs_distances,
                "harmonic": harmonic_centrality,
                "betweenness": betweenness_sample,
                "sssp": lambda e, s, max_depth: sssp(e, s, max_rounds=max_depth),
            }[args.job]
            out, st = fn(edges, seeds, max_depth=args.max_depth)
            out.write.mode("overwrite").parquet(args.output)
            stats = {"levels": st.levels, "converged": st.converged}
        elif args.job == "walks":
            from dmid_spark.algorithms import random_walks

            starts = spark.read.parquet(args.seeds) if args.seeds else None
            out, st = random_walks(
                edges, walk_length=args.walk_length, seed=args.seed, starts=starts
            )
            out.write.mode("overwrite").parquet(args.output)
            stats = {"walkers": st.walkers, "steps": st.steps}
        elif args.job == "node2vec":
            from dmid_spark.algorithms import embed_walks, node2vec_walks

            starts = spark.read.parquet(args.seeds) if args.seeds else None
            walks, st = node2vec_walks(
                edges, walk_length=args.walk_length, p=args.p, q=args.q,
                seed=args.seed, starts=starts,
            )
            emb = embed_walks(walks, dim=args.dim, seed=args.seed)
            emb.write.mode("overwrite").parquet(args.output)
            stats = {"walkers": st.walkers, "steps": st.steps,
                     "vocab": spark.read.parquet(args.output).count()}
        elif args.job == "spectral-embed":
            from dmid_spark.algorithms import spectral_embedding

            emb, st = spectral_embedding(
                edges, k=args.k_dims, iterations=args.iterations,
                seed=args.seed, ckpt=ckpt, resume=args.resume,
            )
            emb.write.mode("overwrite").parquet(args.output)
            stats = {
                "k": st.k, "iterations": st.iterations,
                # comma string: the report printer drops list values
                "eigenvalues": ",".join(str(round(v, 6)) for v in st.eigenvalues),
            }
        elif args.job == "matching":
            from dmid_spark.algorithms import maximal_matching

            m, st = maximal_matching(edges)
            m.write.mode("overwrite").parquet(args.output)
            stats = {"rounds": st.rounds, "matched_edges": st.matched_edges}
        elif args.job == "ppr":
            from dmid_spark.algorithms import personalized_pagerank

            seeds = spark.read.parquet(args.seeds)
            ranks, st = personalized_pagerank(
                edges, seeds, tol=args.tol, ckpt=ckpt, resume=args.resume
            )
            ranks.write.mode("overwrite").parquet(args.output)
            stats = {"iterations": st.iterations, "converged": st.converged,
                     "n_seeds": st.n_seeds}

    print(json.dumps({"job": args.job, **{k: v for k, v in stats.items() if not isinstance(v, list)}}))
    spark.stop()


if __name__ == "__main__":
    main()
