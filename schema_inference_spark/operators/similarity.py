"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. Probes broadcast
  against the corpus (corpus never shuffles); dot products run JVM-side
  via zip_with + aggregate (no Python). O(probes x corpus) — fine for
  bounded probe sets, the calibration path at scale.
- LSH-bucketed ANN: deterministic random-hyperplane signatures shrink the
  candidate set to one bucket (plus its Hamming-1 neighbors if recall
  demands); the scale path — bucket join instead of cross join.
- embedding cosine near-dup: all-pairs above a cosine threshold within
  LSH buckets.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def as_double(col: Column) -> Column:
    return F.transform(col, lambda v: v.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


# ---------------------------------------------------------------------------
# Vectorized pair-similarity kernels (guide §4.2): the per-PAIR dot
# product is the hot loop of every blocked similarity query (~N^2/blocks
# evaluations). JVM expression trees hit a codegen wall here: the
# interpreted HOF fold costs ~25us/pair, and a 64-term expanded chain
# inside a join stage generates a consume() method past the JIT's
# 8000-bytecode HugeMethodLimit, so it runs interpreted (~130us/pair,
# measured — cosine_near_dup was 510s at sf1.0). The sanctioned fix is
# to hand whole blocks to numpy: accumulating ``acc += outer(X[:,d],
# Y[:,d])`` dimension-by-dimension performs the SAME IEEE multiply/add
# sequence per pair as the sequential aggregate() fold — bit-identical
# raw similarities — while running at memory bandwidth. Rounding and
# thresholding stay JVM-side (Spark's HALF_UP round on the shortest
# decimal repr differs from numpy's half-even), so callers see the
# exact same rounded values as before.
# ---------------------------------------------------------------------------

def _np_norms(x: np.ndarray) -> np.ndarray:
    """L2 norms with the fold's accumulation order (acc += v_d * v_d,
    d ascending) — bit-identical to sqrt(aggregate(v, 0.0, acc+v*v))."""
    acc = np.zeros(len(x))
    for d in range(x.shape[1]):
        col = x[:, d]
        acc = acc + col * col
    return np.sqrt(acc)


def _np_pair_dots(xi: np.ndarray, xj: np.ndarray) -> np.ndarray:
    """All-pairs dot products with the fold's accumulation order.

    In-place accumulate into preallocated buffers: `acc = acc + outer`
    allocated two fresh (n, m) temporaries per dimension (128 DRAM-sized
    allocations per block pair); `outer(..., out=tmp); acc += tmp`
    computes bit-identical values (same operands, same per-element add
    order) with two resident buffers — measured 2.2x on a 2000-vector
    group together with the smaller cache-resident block size below."""
    acc = np.zeros((len(xi), len(xj)))
    tmp = np.empty_like(acc)
    for d in range(xi.shape[1]):
        np.multiply.outer(xi[:, d], xj[:, d], out=tmp)
        acc += tmp
    return acc


def _np_mat(series) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list column (float->double
    casts are exact)."""
    return np.vstack(series.to_numpy()).astype(np.float64, copy=False)


# round(x, 4) can raise a value by at most 5e-5 (+ulp), so a raw-sim
# pre-filter at (threshold - 5.2e-5) keeps every pair the JVM's rounded
# threshold keeps; the few extras are dropped by the unchanged JVM
# filter.
ROUND4_MARGIN = 5.2e-5


def self_pair_sims(df: DataFrame, key_col: str, id_col: str, vec_col: str,
                   min_raw: float, block: int = 512) -> DataFrame:
    """Within-group all-pairs raw cosine sims (id1 < id2, sim_raw >=
    min_raw) as (d1, d2, sim_raw) — the numpy kernel behind the
    near-dup queries. Pair blocks are chunked to ``block`` rows a side
    so per-task memory stays bounded regardless of group size."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        x = _np_mat(pdf[vec_col])
        nrm = _np_norms(x)
        n = len(ids)
        d1s, d2s, sims = [], [], []
        for bi in range(0, n, block):
            xi, ni = x[bi:bi + block], nrm[bi:bi + block]
            for bj in range(bi, n, block):
                xj, nj = x[bj:bj + block], nrm[bj:bj + block]
                s = _np_pair_dots(xi, xj) / np.multiply.outer(ni, nj)
                if bi == bj:
                    iu = np.triu_indices(len(xi), k=1)
                    sv = s[iu]
                    keep = sv >= min_raw
                    d1s.append(ids[bi + iu[0][keep]])
                    d2s.append(ids[bj + iu[1][keep]])
                    sims.append(sv[keep])
                else:
                    ii, jj = np.nonzero(s >= min_raw)
                    d1s.append(ids[bi + ii])
                    d2s.append(ids[bj + jj])
                    sims.append(s[ii, jj])
        return pd.DataFrame({
            "d1": np.concatenate(d1s) if d1s else np.array([], dtype=np.int64),
            "d2": np.concatenate(d2s) if d2s else np.array([], dtype=np.int64),
            "sim_raw": (np.concatenate(sims) if sims
                        else np.array([], dtype=np.float64))})
    return df.groupBy(key_col).applyInPandas(
        fn, "d1 long, d2 long, sim_raw double")


def cross_pair_sims(corpus: DataFrame, probes: DataFrame, key: str,
                    block: int = 512) -> DataFrame:
    """Per-block probe x corpus raw cosine sims (pid != nid) as
    (pid, nid, sim_raw) via cogrouped numpy — the rank-stage kernel of
    the blocked ANN family. ``corpus``: (nid, <key>, nvec); ``probes``:
    (pid, <key>, pvec)."""
    def fn(c_pdf: pd.DataFrame, p_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(c_pdf) == 0 or len(p_pdf) == 0:
            return pd.DataFrame({"pid": np.array([], dtype=np.int64),
                                 "nid": np.array([], dtype=np.int64),
                                 "sim_raw": np.array([], dtype=np.float64)})
        nids = c_pdf["nid"].to_numpy()
        xc = _np_mat(c_pdf["nvec"])
        nrm_c = _np_norms(xc)
        pids = p_pdf["pid"].to_numpy()
        xp = _np_mat(p_pdf["pvec"])
        nrm_p = _np_norms(xp)
        ps, ns, sims = [], [], []
        for bi in range(0, len(pids), block):
            pi, npi = xp[bi:bi + block], nrm_p[bi:bi + block]
            for bj in range(0, len(nids), block):
                cj, ncj = xc[bj:bj + block], nrm_c[bj:bj + block]
                s = _np_pair_dots(pi, cj) / np.multiply.outer(npi, ncj)
                ii, jj = np.nonzero(
                    pids[bi:bi + block, None] != nids[None, bj:bj + block])
                ps.append(pids[bi + ii])
                ns.append(nids[bj + jj])
                sims.append(s[ii, jj])
        return pd.DataFrame({
            "pid": np.concatenate(ps),
            "nid": np.concatenate(ns),
            "sim_raw": np.concatenate(sims)})
    return (corpus.groupBy(key).cogroup(probes.groupBy(key))
            .applyInPandas(fn, "pid long, nid long, sim_raw double"))


def cosine_topk(df: DataFrame, probe_ids: List[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                ) -> DataFrame:
    """Exact top-k cosine neighbors for each probe id.

    The probe set (bounded by contract) is collected once and rides the
    task closure; the corpus scan stays put and each partition's sims
    are computed by the numpy kernel (bit-identical raw sims, JVM
    rounding). Ranking is per-probe row_number over (rounded sim desc,
    neighbor asc) — the rounding pins cross-engine float determinism,
    the id tiebreak pins ordering.
    """
    probe_rows = (df.filter(F.col(id_col).isin(probe_ids))
                  .select(id_col, vec_col).orderBy(id_col).collect())
    spark = df.sparkSession
    if not probe_rows:
        sims = spark.createDataFrame([], "pid long, nid long, sim_raw double")
    else:
        pids = np.array([r[0] for r in probe_rows], dtype=np.int64)
        xp = np.array([list(r[1]) for r in probe_rows], dtype=np.float64)
        nrm_p = _np_norms(xp)

        def fn(batches):
            for pdf in batches:
                nids = pdf[id_col].to_numpy()
                if len(nids) == 0:
                    continue
                xc = _np_mat(pdf[vec_col])
                nrm_c = _np_norms(xc)
                s = _np_pair_dots(xp, xc) / np.multiply.outer(nrm_p, nrm_c)
                ii, jj = np.nonzero(pids[:, None] != nids[None, :])
                yield pd.DataFrame({"pid": pids[ii], "nid": nids[jj],
                                    "sim_raw": s[ii, jj]})
        sims = df.select(id_col, vec_col).mapInPandas(
            fn, "pid long, nid long, sim_raw double")
    sims = sims.select("pid", "nid", F.round(F.col("sim_raw"), 4).alias("sim"))
    w = Window.partitionBy("pid").orderBy(F.desc("sim"), F.asc("nid"))
    from .dedup import ordered_output
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("pid", "rank", "nid", "sim")
            .transform(lambda d: ordered_output(d, "pid", "rank")))


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (seeded; no ambient randomness)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(df: DataFrame, dim: int, n_planes: int = 8,
                    seed: int = 42, vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane signature -> bucket id (0..2^n_planes-1).

    Arrow-vectorized numpy kernel: the previous per-plane expanded JVM
    sum was a (dim x n_planes)-term expression per row — far past the
    JIT's method limit, so it ran interpreted (~350us/row measured on
    64-dim/8-plane probes). The kernel accumulates each plane's dot in
    ascending-dimension order (acc = acc + v_d * w_d, vectorized over
    rows), the exact IEEE sequence of the old left-assoc chain, so every
    sign — and therefore every bucket id — is bit-identical. Rows whose
    vector is NULL or not ``dim``-long fold to bucket 0, exactly as the
    old expression's NULL-propagating fallback did."""
    planes = hyperplanes(dim, n_planes, seed)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bucket_of(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        out = np.zeros(n, dtype=np.int32)
        ok = np.array([v is not None and len(v) == dim
                       for v in vecs.to_numpy()], dtype=bool)
        if ok.any():
            x = np.vstack(vecs.to_numpy()[ok]).astype(np.float64,
                                                      copy=False)
            b = np.zeros(len(x), dtype=np.int32)
            for p in range(planes.shape[0]):
                acc = np.zeros(len(x))
                for d in range(dim):
                    acc = acc + x[:, d] * planes[p][d]
                b |= (acc >= 0).astype(np.int32) << p
            out[ok] = b
        return pd.Series(out)

    return df.withColumn("lsh_bucket", bucket_of(F.col(vec_col)))


def topk_from_blocks(corpus: DataFrame, probes: DataFrame, key: str,
                     k: int = 5) -> DataFrame:
    """The rank stage of blocked ANN (LSH buckets or IVF cells), split
    out so it can be oracle-gated over exported block-assignment seams:
    the block assignment is engine-seeded (hyperplane hashes / k-means
    cells), but this stage — equi-join on the block key, exact cosine,
    per-probe top-k — is deterministic arithmetic any engine reproduces.

    ``corpus``: (nid, <key>, nvec array<double>);
    ``probes``: (pid, <key>, pvec array<double>) — one row per (probe,
    block) the probe searches. The raw per-pair sims come from the
    cogrouped numpy kernel (bit-identical to the sequential-fold dot);
    rounding, the -0.0 collapse and the top-k window stay JVM-side."""
    c = corpus.select("nid", F.col(key).alias("_k"), "nvec")
    p = probes.select("pid", F.col(key).alias("_k"), "pvec")
    # + 0.0 collapses IEEE -0.0 to +0.0: a tiny negative cosine that
    # rounds to zero must stringify identically in every engine (the
    # oracle SQL carries the same "+ 0" term)
    sims = (cross_pair_sims(c, p, "_k")
            .select("pid", "nid",
                    (F.round(F.col("sim_raw"), 4)
                     + F.lit(0.0)).alias("sim")))
    w = Window.partitionBy("pid").orderBy(F.desc("sim"), F.asc("nid"))
    from .dedup import ordered_output
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("pid", "rank", "nid", "sim")
            .transform(lambda d: ordered_output(d, "pid", "rank")))


def lsh_blocks(df: DataFrame, probe_ids: List[int],
               dim: int = 64, n_planes: int = 8, seed: int = 42,
               id_col: str = "vec_id", vec_col: str = "embedding",
               ) -> tuple:
    """Block-assignment stage of LSH ANN: (corpus, probes) frames keyed
    by ``lsh_bucket``, ready for ``topk_from_blocks`` (or export)."""
    vec = as_double(F.col(vec_col))
    corpus = with_lsh_bucket(df, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("nid"), F.col("lsh_bucket"), vec.alias("nvec"))
    probes = (corpus.filter(F.col("nid").isin(probe_ids))
              .select(F.col("nid").alias("pid"), "lsh_bucket",
                      F.col("nvec").alias("pvec")))
    return corpus, probes


def lsh_topk(df: DataFrame, probe_ids: List[int], k: int = 5,
             dim: int = 64, n_planes: int = 8, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             ) -> DataFrame:
    """ANN top-k within the probe's LSH bucket — the scale path: the
    probe-corpus join is an equi-join on bucket, not a cross join.
    Recall < 1 by construction; calibrate bucket bits against the
    brute-force baseline."""
    corpus, probes = lsh_blocks(df, probe_ids, dim, n_planes, seed,
                                id_col, vec_col)
    return topk_from_blocks(corpus, probes, "lsh_bucket", k)


def ann_against_index(new_df: DataFrame, index: DataFrame, k: int = 5,
                      dim: int = 64, n_planes: int = 8, seed: int = 42,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      ) -> DataFrame:
    """Incremental ANN: arriving embeddings ranked against a PERSISTENT
    LSH-bucketed corpus index — the embedding analog of
    ``dedup.near_dup_against_index``. The index is the corpus frame of
    ``lsh_blocks`` (nid, lsh_bucket, nvec), written once at indexing
    time (bucketed by lsh_bucket at the warehouse); each new vector is
    bucketed with the SAME seeded hyperplanes and top-k ranked against
    its bucket's indexed members. O(new) per ingest: the new batch
    broadcasts through ``topk_from_blocks``, the index never shuffles,
    and appending the probed batch to the index afterwards is a plain
    bucketed APPEND of its (nid, lsh_bucket, nvec) rows — no rewrite,
    no compaction needed (buckets have no cap here; rank-k bounds the
    output instead)."""
    vec = as_double(F.col(vec_col))
    probes = (with_lsh_bucket(new_df, dim, n_planes, seed, vec_col)
              .select(F.col(id_col).alias("pid"), "lsh_bucket",
                      vec.alias("pvec")))
    return topk_from_blocks(index, probes, "lsh_bucket", k)


def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.9,
                          dim: int = 64, n_planes: int = 8, seed: int = 42,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          ) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold, bucket-blocked:
    all-pairs only *within* LSH buckets (plus exact cosine verify)."""
    bucketed = with_lsh_bucket(df, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"),
        "lsh_bucket")
    raw = self_pair_sims(bucketed, "lsh_bucket", "doc", "vec",
                         min_raw=threshold - ROUND4_MARGIN)
    return (raw.select("d1", "d2",
                       F.round(F.col("sim_raw"), 4).alias("sim"))
            .filter(F.col("sim") >= threshold)
            .orderBy("d1", "d2"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + cell-blocked search
# ---------------------------------------------------------------------------

def train_ivf_centroids(df, n_centroids: int = 16, sample_n: int = 2048,
                        iters: int = 8, seed: int = 42,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> np.ndarray:
    """Deterministic coarse quantizer: Lloyd's k-means over a fixed sample
    (first sample_n ids — reproducible, no ambient randomness), computed
    driver-side with numpy. At 100 TB the sample is still driver-sized:
    training touches sample_n vectors, never the corpus.
    """
    rows = (df.orderBy(id_col).limit(sample_n)
            .select(vec_col).collect())
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)),
                         replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def with_ivf_cell(df, centroids: np.ndarray,
                  vec_col: str = "embedding"):
    """Assign each vector to its nearest centroid — an Arrow-vectorized
    Pandas UDF (one matrix multiply per batch; the sanctioned Python path
    for embedding math: numpy BLAS beats per-element JVM expressions for
    argmax-over-centroids)."""
    from pyspark.sql.functions import pandas_udf

    cents = centroids  # captured, broadcast with the closure

    @pandas_udf("int")
    def cell_of(vecs: pd.Series) -> pd.Series:
        # vstack over the Series' ndarray items: one C-level copy per
        # batch (np.array(tolist()) re-boxes every element via Python)
        x = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series((x @ cents.T).argmax(axis=1).astype(np.int32))

    return df.withColumn("ivf_cell", cell_of(F.col(vec_col)))


def ivf_blocks(df, probe_ids: List[int], n_centroids: int = 16,
               nprobe: int = 2, seed: int = 42,
               id_col: str = "vec_id", vec_col: str = "embedding") -> tuple:
    """Block-assignment stage of IVF ANN: (corpus, probes) frames keyed
    by ``ivf_cell``, ready for ``topk_from_blocks`` (or export).

    Probe cells are computed driver-side (tiny); the probe side is BUILT
    from the collected rows instead of re-scanning the corpus and
    joining against a cells table — the probe set is bounded by
    construction, so a local DataFrame broadcast is the right plan at
    any corpus size. No distinct needed downstream: each corpus vector
    lives in exactly ONE cell and (pid, cell) probe rows are unique, so
    a (pid, nid) pair can appear at most once."""
    cents = train_ivf_centroids(df, n_centroids, seed=seed,
                                id_col=id_col, vec_col=vec_col)
    vec = as_double(F.col(vec_col))
    corpus = with_ivf_cell(df, cents, vec_col).select(
        F.col(id_col).alias("nid"), F.col("ivf_cell"), vec.alias("nvec"))

    probe_rows = (df.filter(F.col(id_col).isin(probe_ids))
                  .select(id_col, vec_col).collect())
    pc_rows = []
    for r in probe_rows:
        v = np.array(r[1], dtype=np.float64)
        nrm = float(np.linalg.norm(v))
        cells = np.argsort(-(cents @ (v / max(nrm, 1e-12))))[:nprobe]
        for c in cells:
            pc_rows.append((int(r[0]), int(c), [float(x) for x in r[1]]))
    spark = df.sparkSession
    probes = spark.createDataFrame(
        pc_rows, "pid bigint, ivf_cell int, pvec array<double>")
    return corpus, probes


def ivf_topk(df, probe_ids: List[int], k: int = 5, n_centroids: int = 16,
             nprobe: int = 2, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF ANN top-k: probes search only their nprobe nearest cells.

    The corpus-side join key is the cell id — an equi-join, no cross
    join; recall grows with nprobe (calibrate against cosine_topk).
    """
    corpus, probes = ivf_blocks(df, probe_ids, n_centroids, nprobe, seed,
                                id_col, vec_col)
    return topk_from_blocks(corpus, probes, "ivf_cell", k)
