"""Source-code-repo corpus: deterministic synthesis, ingest, edge derivation.

The engine's primary input (BASELINE.json:15) is a table of source-code
repositories ``(repo, path, commit, lang, content)`` stored as Iceberg at
10^12-file scale; in this sandbox it is synthesized deterministically (no
external data) and read/written as parquet.

- ``synthesize_corpus`` — distributed, seed-deterministic generator: repo
  sizes are power-law (hub repos), commits include mega-commits (skew), and
  every file's imports reference other files in the same repo so the derived
  graph has real structure. All fields derive from the row id via a
  vectorized splitmix64 mix inside ``mapInPandas`` (Arrow batches, no
  per-row Python objects beyond pandas string ops).
- ``ingest`` — stamps ``content_sha = sha2(content, 256)`` (JVM-side); the
  per-row sha256-equality invariant (BASELINE.json:15) is asserted in tests
  against hashlib.
- ``derive_edges`` — the three relations of BASELINE.json:6:
    repo↔path      (containment)
    path↔import    (imports parsed from content — JVM regexp_extract_all,
                    no Python in the hot path)
    commit co-change (paths sharing a commit, capped per commit to bound
                    the quadratic blowup of mega-commits)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"
_LANGS = ["py", "js", "go", "java"]
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

# One alternation matching every language's import syntax we emit.
IMPORT_RE = r"(?:import|require)[ (\"']*(mod_[0-9]+)"


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """Vectorized splitmix64 — the only RNG; fully determined by (x, salt)."""
    gamma = np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
    z = (x.astype(np.uint64) + gamma) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _repo_layout(n_files: int, n_repos: int, seed: int):
    """Power-law repo sizes (hub repos) summing exactly to n_files."""
    rng = np.random.default_rng(seed)
    raw = rng.zipf(1.3, size=n_repos).astype(np.float64)
    sizes = np.maximum(1, np.floor(raw / raw.sum() * n_files)).astype(np.int64)
    # fix rounding so sizes sum to n_files; dump the remainder on repo 0 (hub)
    sizes[0] += n_files - sizes.sum()
    if sizes[0] < 1:  # pathological tiny inputs
        sizes = np.full(n_repos, n_files // n_repos, dtype=np.int64)
        sizes[0] += n_files - sizes.sum()
    bounds = np.cumsum(sizes)
    return sizes, bounds


def synthesize_corpus(
    spark: SparkSession,
    n_files: int = 10_000,
    n_repos: int = 100,
    commits_per_file: int = 2,
    imports_per_file: int = 3,
    seed: int = 42,
    mega_commit_pct: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """One row per (file, commit-revision); fully deterministic in ``seed``."""
    sizes, bounds = _repo_layout(n_files, n_repos, seed)
    bc = spark.sparkContext.broadcast((sizes, bounds))
    n_rows = n_files * commits_per_file
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    cpf, ipf, sd, mega = commits_per_file, imports_per_file, seed, mega_commit_pct

    def gen(batches):
        sizes_, bounds_ = bc.value
        starts_ = bounds_ - sizes_
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            f = (ids // np.uint64(cpf)).astype(np.int64)
            rev = (ids % np.uint64(cpf)).astype(np.int64)
            r = np.searchsorted(bounds_, f, side="right")
            size_r = sizes_[r]
            start_r = starts_[r]

            lang_ix = (_mix(f.astype(np.uint64), sd + 1) % np.uint64(4)).astype(int)
            lang = np.array(_LANGS, dtype=object)[lang_ix]

            # commits: per-repo pool ~ size/2; a mega_commit_pct% slice of
            # revisions lands on commit 0 of its repo (mega-commit skew).
            pool = np.maximum(1, size_r // 2)
            k = (
                _mix(f.astype(np.uint64) * np.uint64(31) + rev.astype(np.uint64), sd + 2)
                % pool.astype(np.uint64)
            ).astype(np.int64)
            is_mega = (
                _mix(ids, sd + 3) % np.uint64(100) < np.uint64(mega)
            )
            k = np.where(is_mega, 0, k)

            r_str = pd.Series(r).astype(str)
            repo = "r" + r_str
            path = "src/mod_" + pd.Series(f).astype(str) + ".py"
            commit = "c" + r_str + "_" + pd.Series(k).astype(str)

            # imports: ipf targets inside the same repo (never self) —
            # fully vectorized (numpy sort + pandas string concat).
            imp_cols = []
            for j in range(ipf):
                t = start_r + (
                    _mix(f.astype(np.uint64) + np.uint64(j * 1_000_003), sd + 4)
                    % size_r.astype(np.uint64)
                ).astype(np.int64)
                t = np.where(t == f, start_r + (t + 1 - start_r) % size_r, t)
                imp_cols.append(t)
            imp = np.sort(np.stack(imp_cols, axis=1), axis=1)

            mods = [pd.Series(imp[:, j]).astype(str) for j in range(ipf)]
            lang_s = pd.Series(lang)
            imports = pd.Series([""] * len(ids), dtype=object)
            for lg, pre, post in (
                ("py", "import mod_", "\n"),
                ("js", 'require("mod_', '");\n'),
                ("go", 'import "mod_', '"\n'),
                ("java", "import mod_", ";\n"),
            ):
                m = (lang_s == lg).to_numpy()
                if not m.any():
                    continue
                acc = pd.Series([""] * int(m.sum()), dtype=object)
                for j in range(ipf):
                    acc = acc + pre + mods[j][m].reset_index(drop=True) + post
                imports[m] = acc.to_numpy()

            filler = pd.Series(_mix(ids, sd + 5)).astype(str)
            content = (
                "// " + lang_s + " file mod_" + pd.Series(f).astype(str)
                + " rev " + pd.Series(rev).astype(str) + "\n"
                + imports + "func_" + filler + "()\n"
            )

            yield pd.DataFrame(
                {
                    "repo": repo,
                    "path": path,
                    "commit": commit,
                    "lang": lang_s,
                    "content": content,
                }
            )

    return spark.range(0, n_rows, numPartitions=num_partitions).mapInPandas(
        gen, CORPUS_SCHEMA
    )


def ingest(corpus: DataFrame) -> DataFrame:
    """Stamp the sha256 row invariant (BASELINE.json:15) — JVM-side sha2."""
    return corpus.withColumn("content_sha", F.sha2(F.col("content"), 256))


def path_node(repo_col, path_col):
    return F.concat(F.lit("path:"), repo_col, F.lit("/"), path_col)


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    cap: int | None = 64,
    weighted: bool = False,
) -> DataFrame:
    """Capped co-occurrence pair derivation: items sharing a group become an
    edge (item_a < item_b). The per-group cap bounds the quadratic blowup of
    hub groups (mega-commits, boilerplate parts) at O(cap²) pairs per group —
    the shape the north rule demands for every self-join derivation.
    Deterministic cap: the ``cap`` lexicographically-first items per group.

    Returns [src, dst] distinct pairs, plus ``weight`` = number of shared
    groups when ``weighted``.
    """
    gi = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("i")).distinct()
    if cap is None or cap >= 2**31:
        # uncapped: orient pairs by item order directly — no row_number
        # window (its per-group sort would be pure waste when nothing is cut)
        a, b = gi.alias("a"), gi.alias("b")
        pairs = a.join(
            b, (F.col("a.g") == F.col("b.g")) & (F.col("a.i") < F.col("b.i"))
        ).select(F.col("a.i").alias("src"), F.col("b.i").alias("dst"))
    else:
        rn = F.row_number().over(Window.partitionBy("g").orderBy("i"))
        capped = gi.withColumn("rn", rn).filter(F.col("rn") <= cap)
        a, b = capped.alias("a"), capped.alias("b")
        pairs = a.join(
            b, (F.col("a.g") == F.col("b.g")) & (F.col("a.rn") < F.col("b.rn"))
        ).select(F.col("a.i").alias("src"), F.col("b.i").alias("dst"))
    if weighted:
        return pairs.groupBy("src", "dst").agg(
            F.count(F.lit(1)).cast("double").alias("weight")
        )
    return pairs.distinct()


def derive_edges(corpus: DataFrame, cochange_cap: int = 16) -> DataFrame:
    """Edge table (src, dst, weight, rel) from the three relations of
    BASELINE.json:6. All JVM-side (regexp, joins, windows) — no Python."""
    files = corpus.select("repo", "path", "content").dropDuplicates(["repo", "path"])

    repo_path = files.select(
        F.concat(F.lit("repo:"), F.col("repo")).alias("src"),
        path_node(F.col("repo"), F.col("path")).alias("dst"),
        F.lit(1.0).alias("weight"),
        F.lit("contains").alias("rel"),
    )

    imports = (
        files.select(
            "repo",
            "path",
            F.explode(
                F.regexp_extract_all("content", F.lit(IMPORT_RE), F.lit(1))
            ).alias("mod"),
        )
        .select(
            path_node(F.col("repo"), F.col("path")).alias("src"),
            path_node(
                F.col("repo"), F.concat(F.lit("src/"), F.col("mod"), F.lit(".py"))
            ).alias("dst"),
        )
        # single-file repos can only self-import; a file never links itself
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .select("src", "dst", F.lit(1.0).alias("weight"), F.lit("imports").alias("rel"))
    )

    # commit co-change: paths sharing a commit, capped per commit so a
    # mega-commit of M files costs O(cap^2) pairs, not O(M^2).
    cp = corpus.select("commit", path_node(F.col("repo"), F.col("path")).alias("p"))
    cochange = cooccurrence_edges(
        cp, "commit", "p", cap=cochange_cap, weighted=True
    ).select("src", "dst", "weight", F.lit("cochange").alias("rel"))

    return repo_path.unionByName(imports).unionByName(cochange)
