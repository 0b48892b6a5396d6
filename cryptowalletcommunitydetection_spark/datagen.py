"""Deterministic synthetic inputs (SURVEY.md §7 step 2, FIXTURES.md).

Everything is seeded — no wall clock, no uuid (the reference's uuid4 ids
at services/wallet_clustering.py:6-7 are exactly what resumability
forbids). Two families:

- ``gen_files``: the north-rule input, an Iceberg-style
  ``files(repo, path, commit, lang, content)`` table whose content
  embeds plantable entities (``import ent_<k>`` lines) so the expected
  co-occurrence edge table is computable by the pure-Python oracle
  (tests/oracles.py::expected_cooccurrence).
- shaped graphs (ring, star/hub, two cliques + bridge, Erdős–Rényi) and
  synthetic wallet pairs — the reference's community-assignment fixtures
  (data/*_wallets_pairs.csv, schema (index, x, y)) re-created at chosen
  scale with planted components.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["py", "java", "go", "js", "rs"]

FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _commit_hex(repo: str, seq: int) -> str:
    return hashlib.sha1(f"{repo}:{seq}".encode()).hexdigest()


def gen_files_pdf(
    n_repos: int = 20,
    files_per_repo: int = 25,
    n_entities: int = 60,
    entities_per_file: int = 4,
    commits_per_repo: int = 2,
    seed: int = 42,
    zipf_hub_repo: bool = True,
) -> pd.DataFrame:
    """Pandas form of the synthetic files table (driver-side; test scale).

    Entity choice is rng-driven but fully determined by the seed; the
    oracle recomputes edges from the returned content strings, so no
    side-channel between generator and oracle.
    """
    rng = random.Random(seed)
    rows = []
    for i in range(n_repos):
        repo = f"repo_{i:05d}"
        # Zipf-ish skew: repo 0 gets 4x the files (hub generator)
        nf = files_per_repo * (4 if (zipf_hub_repo and i == 0) else 1)
        for c in range(commits_per_repo):
            commit = _commit_hex(repo, c)
            for k in range(nf):
                lang = LANGS[(i + k) % len(LANGS)]
                ents = rng.sample(range(n_entities), min(entities_per_file, n_entities))
                lines = [f"import ent_{e:04d}" for e in sorted(ents)]
                body = f"def f_{k}():\n    return {k * 31 + i}\n"
                content = "\n".join(lines) + "\n" + body
                rows.append(
                    {
                        "repo": repo,
                        "path": f"src/mod_{k % 7}/file_{k:04d}.{lang}",
                        "commit": commit,
                        "lang": lang,
                        "content": content,
                    }
                )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def gen_files(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(gen_files_pdf(**kw), schema=FILES_SCHEMA)


def gen_files_distributed(
    spark: SparkSession,
    n_files: int,
    n_repos: int = 1000,
    n_entities: int = 50_000,
    entities_per_file: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Files table generated DISTRIBUTIVELY (spark.range + xxhash64 —
    no driver materialization), for benching the extraction pipeline at
    scales where the pandas generator would OOM the driver. Entity
    choice per file is a deterministic hash of (file id, slot), so the
    expected edges are recomputable from the content strings alone
    (tests/oracles.py::expected_cooccurrence — same contract as
    gen_files)."""
    from pyspark.sql import functions as F

    f = spark.range(n_files)
    repo = F.concat(
        F.lit("repo_"),
        F.lpad(F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_repos)).cast("string"), 6, "0"),
    )
    ents = F.transform(
        F.sequence(F.lit(0), F.lit(entities_per_file - 1)),
        lambda j: F.concat(
            F.lit("import ent_"),
            F.lpad(
                F.pmod(F.xxhash64("id", j + seed + 1), F.lit(n_entities)).cast("string"),
                6, "0",
            ),
        ),
    )
    content = F.concat(
        F.concat_ws("\n", F.array_distinct(ents)),
        F.lit("\ndef f():\n    return "),
        F.col("id").cast("string"),
        F.lit("\n"),
    )
    return f.select(
        repo.alias("repo"),
        F.concat(F.lit("src/file_"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("py").alias("lang"),
        content.alias("content"),
    )


# ---------------------------------------------------------------- graphs

def ring(n: int) -> list[tuple[int, int]]:
    return [(i, (i + 1) % n) for i in range(n)]


def star(n: int, hub: int = 0) -> list[tuple[int, int]]:
    return [(hub, i) for i in range(n) if i != hub]


def clique(k: int) -> list[tuple[int, int]]:
    return [(i, j) for i in range(k) for j in range(i + 1, k)]


def two_cliques_bridge(k: int) -> list[tuple[int, int]]:
    """Two k-cliques {0..k-1} and {k..2k-1} joined by one bridge edge."""
    e = [(i, j) for i in range(k) for j in range(i + 1, k)]
    e += [(k + i, k + j) for i in range(k) for j in range(i + 1, k)]
    e.append((0, k))
    return e


def erdos_renyi(n: int, p: float, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p]


def edges_df(spark: SparkSession, pairs: list[tuple[int, int]]) -> DataFrame:
    pdf = pd.DataFrame(pairs, columns=["src", "dst"])
    return spark.createDataFrame(pdf, schema="src long, dst long")


def gen_wallet_pairs_pdf(
    n_components: int = 8,
    users_per_component: int = 6,
    depos_per_component: int = 2,
    seed: int = 42,
) -> pd.DataFrame:
    """Synthetic (from_address, to_address) pairs with planted components
    — the reference fixture shape (data/0x38_wallets_pairs.csv: x=user,
    y=deposit wallet; consumed at services/wallet_clustering.py:51-59)."""
    rng = random.Random(seed)
    rows = []
    addr = lambda tag, c, i: "0x" + hashlib.sha1(f"{tag}:{c}:{i}".encode()).hexdigest()[:40]
    for c in range(n_components):
        depos = [addr("d", c, j) for j in range(depos_per_component)]
        for i in range(users_per_component):
            u = addr("u", c, i)
            # every user sends to >=1 deposit wallet of its component
            for d in rng.sample(depos, 1 + rng.randrange(len(depos))):
                rows.append({"from_address": u, "to_address": d})
    return pd.DataFrame(rows, columns=["from_address", "to_address"])


def gen_wallet_pairs(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(
        gen_wallet_pairs_pdf(**kw), schema="from_address string, to_address string"
    )
