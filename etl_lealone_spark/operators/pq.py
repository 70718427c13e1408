"""Product quantization (PQ) for embeddings — the memory side of the
100 TB ANN design.

IVF (similarity.py) bounds how much of the corpus a query SCANS;
PQ bounds how much memory each vector COSTS: the d-dim vector is split
into ``m`` subspaces, each subspace gets a ``k``-centroid codebook
(k-means), and a vector is stored as ``m`` small codes (m bytes at
k<=256) instead of 4d bytes — a 32-64x compression that turns a
trillion-vector index into something executors can hold. Distances are
computed asymmetrically (ADC, Jegou et al. 2011): the query stays
exact, per-subspace distances to every centroid are tabulated ONCE per
query (an m*k table), and each corpus vector scores as m table lookups.

Spark shapes:

- **Training** (``pq_train``): Lloyd's k-means per subspace, all
  subspaces in the SAME distributed pass — explode to (subspace,
  subvector), assign via an Arrow-vectorized argmin against the
  broadcast codebooks, update with exact integer sums per (subspace,
  centroid, dim). Centroids live driver-side (m*k*dsub ints — constant
  size); only assignments are distributed. Determinism: integer-
  quantized vectors (similarity.quantize), hash-chosen seeds, exact
  integer sums with floor-division means, lowest-index argmin
  tie-break — the codebook is identical across partitionings and
  reruns (pinned by test).
- **Encoding** (``pq_encode``): map-only — one Arrow batch pass, no
  shuffle at any corpus size.
- **Query** (``pq_adc_topk``): the m*k distance table is computed on
  the driver from the exact query, broadcast in the closure, and the
  scan is map-only lookups + ``TakeOrderedAndProject``.

Training on the full corpus is unnecessary at scale: ``pq_train`` takes
a deterministic hash-sample cap (``train_cap``) — the standard practice
(FAISS trains codebooks on ~100k-1M samples regardless of index size).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .similarity import quantize


def _sub_slices(dim: int, m: int) -> list[tuple[int, int]]:
    """[(start, len)] per subspace; dim need not divide evenly."""
    base, rem = divmod(dim, m)
    out, start = [], 0
    for i in range(m):
        ln = base + (1 if i < rem else 0)
        out.append((start, ln))
        start += ln
    return out


def _sq_dists(X, C):
    """Exact squared-L2 distances of int64 rows X (n, d) to centroids C
    (k, d): |x|^2 - 2 x.c + |c|^2 — the one expression every assign/
    encode path shares."""
    return (
        (X * X).sum(axis=1, keepdims=True)
        - 2 * X @ C.T
        + (C * C).sum(axis=1)[None, :]
    )


def _seed_order(n: int, tag: str) -> list[int]:
    """Deterministic pseudo-random order of range(n) by md5 of (tag, i)."""
    return sorted(range(n), key=lambda i: hashlib.md5(f"{tag}:{i}".encode()).digest())


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    iters: int = 4,
    train_cap: int = 100_000,
) -> list[list[list[int]]]:
    """Learn PQ codebooks; returns ``codebooks[m][k][dsub]`` (int64).

    Seeds for subspace ``s`` are the subvectors of the ``k`` training
    rows with the smallest md5-of-id hashes (hash-spread — independent
    of row order); empty clusters keep their previous centroid.
    """
    import numpy as np

    spark = df.sparkSession
    train = df.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("qv")
    )
    if train_cap:
        # deterministic hash-sample: smallest md5 buckets first
        train = train.withColumn(
            "__hb",
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
            .cast("long"),
        ).orderBy("__hb").limit(train_cap).drop("__hb")
    rows = train.collect() if train_cap and train_cap <= 10_000 else None
    if rows is None:
        # cap larger than driver comfort: keep distributed; collect ids+vecs
        # only for seeding (k rows)
        rows = train.orderBy("id").limit(max(k * 4, 64)).collect()
    X_seed = np.array([r["qv"] for r in rows], dtype=np.int64)
    dim = X_seed.shape[1]
    slices = _sub_slices(dim, m)
    order = _seed_order(len(rows), "pq-seed")
    centroids = [
        np.stack([X_seed[order[j % len(order)], s : s + ln] for j in range(k)])
        for (s, ln) in slices
    ]  # m arrays of (k, dsub)

    train = train.localCheckpoint(eager=True)  # training sample reused per iter

    for _ in range(iters):
        bc = spark.sparkContext.broadcast([c.tolist() for c in centroids])

        def assign(batches):
            import numpy as np  # noqa: PLC0415

            cents = [np.array(c, dtype=np.int64) for c in bc.value]
            for pdf in batches:
                Xb = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
                out = {"sub": [], "cid": [], "svec": []}
                for s_i, (s, ln) in enumerate(slices):
                    sub = Xb[:, s : s + ln]
                    cid = _sq_dists(sub, cents[s_i]).argmin(axis=1)  # lowest index wins ties
                    out["sub"] += [s_i] * len(cid)
                    out["cid"] += cid.tolist()
                    out["svec"] += [r.tolist() for r in sub]
                import pandas as pd  # noqa: PLC0415

                yield pd.DataFrame(out)

        schema = T.StructType(
            [
                T.StructField("sub", T.IntegerType()),
                T.StructField("cid", T.IntegerType()),
                T.StructField("svec", T.ArrayType(T.LongType())),
            ]
        )
        assigned = train.mapInPandas(assign, schema=schema)
        # exact integer per-dimension sums -> deterministic means
        sums = (
            assigned.select(
                "sub", "cid", F.posexplode("svec").alias("pos", "v")
            )
            .groupBy("sub", "cid", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        new_cents = [c.copy() for c in centroids]
        for r in sums:
            # exact integer mean; clusters with no assignment keep their
            # previous centroid (no row -> no overwrite)
            new_cents[r["sub"]][r["cid"], r["pos"]] = r["s"] // r["c"]
        centroids = new_cents
        bc.destroy()
    return [c.tolist() for c in centroids]


def _encode_fn(codebooks, slices):
    def encode(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        cents = [np.array(c, dtype=np.int64) for c in codebooks]
        for pdf in batches:
            Xb = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            codes = np.empty((len(Xb), len(slices)), dtype=np.int32)
            for s_i, (s, ln) in enumerate(slices):
                codes[:, s_i] = _sq_dists(Xb[:, s : s + ln], cents[s_i]).argmin(
                    axis=1
                )
            yield pd.DataFrame(
                {"id": pdf["id"], "codes": [r.tolist() for r in codes]}
            )

    return encode


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes) — m small ints per vector; map-only, zero shuffle."""
    import numpy as np

    dim = int(np.sum([len(cb[0]) for cb in codebooks]))
    slices = _sub_slices(dim, len(codebooks))
    src = df.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("qv")
    )
    schema = T.StructType(
        [
            T.StructField("id", src.schema["id"].dataType),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    return src.mapInPandas(_encode_fn(codebooks, slices), schema=schema)


def pq_adc_topk(
    codes_df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[int]]],
    k: int = 10,
    id_col: str = "id",
) -> DataFrame:
    """Top-k nearest codes to the query by asymmetric distance.

    The m*k lookup table is built driver-side from the EXACT query;
    scoring is ``m`` array lookups per row (JVM expression, no Python)
    + TakeOrderedAndProject.
    """
    import numpy as np

    q = np.array([int(np.floor(x * 1_000_000 + 0.5)) for x in query_vec], dtype=np.int64)
    dim = int(np.sum([len(cb[0]) for cb in codebooks]))
    slices = _sub_slices(dim, len(codebooks))
    table = []  # [m][k] squared distances
    for s_i, (s, ln) in enumerate(slices):
        cents = np.array(codebooks[s_i], dtype=np.int64)
        sub = q[s : s + ln]
        d = ((cents - sub[None, :]) ** 2).sum(axis=1)
        table.append(d.tolist())
    # UNROLLED ADC sum, not aggregate(zip_with(...)) — the fold runs
    # interpreted outside codegen (r10 verdict task 4; measurement in
    # clustering._sq_dist_sql). m is bounded by the codebook count, so
    # the element_at(tbl_i, code_i+1) + ... tree is bounded; get() NULLs
    # a short codes array like zip_with's padding, and the size guard
    # preserves the fold's NULL when codes outruns the table. Built as
    # ONE JVM-parsed SQL string — m*k literal Columns would cost
    # hundreds of py4j roundtrips (the clustering._sq_dist_sql finding).
    terms = " + ".join(
        "element_at(array("
        + ",".join(f"{int(v)}L" for v in row)
        + f"), get(codes, {i}) + 1)"
        for i, row in enumerate(table)
    )
    dist: Column = F.expr(
        f"CASE WHEN size(codes) <= {len(table)} "
        f"THEN CAST(0 AS BIGINT) + {terms} END"
    )
    return (
        codes_df.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


class IvfPqIndex:
    """Persisted IVF-PQ index: coarse clusters prune the SCAN, PQ codes
    bound the MEMORY — together the standard billion-vector ANN layout
    (FAISS IVFPQ), expressed as parquet partitioning + JVM expressions.

    Layout under ``root``:
      _meta.json — centroids (coarse, ~sqrt(n)) + PQ codebooks (m*k)
      assign/    — (vec_id, codes) parquet, hive-partitioned by cid

    Build cost: one pass to train codebooks on a hash-sample, one
    Arrow-vectorized pass assigning every vector to its coarse cluster
    AND encoding its m PQ codes simultaneously. A probe reads ONLY the
    ``n_probe`` matching partition directories (parquet partition
    pruning) and scores them as m table lookups per row — no full
    vectors are ever read at query time.
    """

    def __init__(
        self,
        spark,
        root: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        m: int = 8,
        k: int = 16,
    ):
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.vec_col = vec_col
        self.m = m
        self.k = k

    def _meta_path(self) -> str:
        import os

        return os.path.join(self.root, "_meta.json")

    def exists(self) -> bool:
        import os

        return os.path.exists(self._meta_path())

    def build(self, corpus: DataFrame, force: bool = False) -> None:
        import json
        import math
        import os
        import shutil

        import numpy as np
        import pandas as pd

        if self.exists() and not force:
            return
        codebooks = pq_train(
            corpus, vec_col=self.vec_col, id_col=self.id_col, m=self.m, k=self.k
        )
        cq = corpus.select(
            F.col(self.id_col).alias("vec_id"),
            quantize(F.col(self.vec_col)).alias("qv"),
        )
        n = cq.count()
        # ~sqrt(n) coarse centroids, chosen by md5-hash order of the id —
        # a deterministic spread over ACTUAL rows (an id-modulo rule can
        # select zero rows when ids are sparse/offset)
        n_cent = max(1, int(math.floor(math.sqrt(float(n)))))
        cent_rows = sorted(
            cq.withColumn(
                "__hb",
                F.conv(
                    F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("long"),
            )
            .orderBy("__hb", "vec_id")
            .limit(n_cent)
            .drop("__hb")
            .collect(),
            key=lambda r: r["vec_id"],
        )
        cids = np.asarray([r["vec_id"] for r in cent_rows], dtype=np.int64)
        CENT = np.stack([np.asarray(r["qv"], dtype=np.int64) for r in cent_rows])
        dim = CENT.shape[1]
        m = self.m  # locals only below — the closure must not capture self
        slices = _sub_slices(dim, m)
        cb = [np.array(c, dtype=np.int64) for c in codebooks]

        def assign_encode(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                Xb = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
                # coarse: exact squared-L2 argmin, lowest cid wins ties
                best = _sq_dists(Xb, CENT).argmin(axis=1)
                codes = np.empty((len(Xb), m), dtype=np.int32)
                for s_i, (s, ln) in enumerate(slices):
                    codes[:, s_i] = _sq_dists(Xb[:, s : s + ln], cb[s_i]).argmin(
                        axis=1
                    )
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "codes": [r.tolist() for r in codes],
                        "cid": cids[best],
                    }
                )

        tmp = self.root + ".build"
        shutil.rmtree(tmp, ignore_errors=True)
        cq.mapInPandas(
            assign_encode, schema="vec_id long, codes array<int>, cid long"
        ).write.mode("overwrite").partitionBy("cid").parquet(
            os.path.join(tmp, "assign")
        )
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump(
                {
                    "n": n,
                    "n_cent": n_cent,
                    "codebooks": codebooks,
                    "cids": cids.tolist(),
                    "centroids": CENT.tolist(),
                },
                f,
            )
        if force:
            shutil.rmtree(self.root, ignore_errors=True)  # rebuild replaces
        try:
            os.rename(tmp, self.root)
        except OSError:
            # lost a concurrent-build race (root appeared): keep the
            # winner, discard ours — but NEVER mask a failed forced
            # rebuild as success
            shutil.rmtree(tmp, ignore_errors=True)
            if not self.exists():
                raise

    def topk(self, query_vec: list[float], k: int = 10, n_probe: int = 4) -> DataFrame:
        """Top-k by ADC distance within the ``n_probe`` best coarse
        clusters for ONE query; reads only those partitions (parquet
        pruning). For offline large-query-set reprocessing use
        :meth:`topk_batch`."""
        import json
        import os

        import numpy as np

        with open(self._meta_path()) as f:
            meta = json.load(f)
        codebooks = meta["codebooks"]
        cids = np.asarray(meta["cids"], dtype=np.int64)
        CENT = np.asarray(meta["centroids"], dtype=np.int64)
        q = np.array(
            [int(np.floor(x * 1_000_000 + 0.5)) for x in query_vec], dtype=np.int64
        )
        d = ((CENT - q[None, :]) ** 2).sum(axis=1)
        order = np.lexsort((cids, d))  # dist asc, cid asc on ties
        probed = sorted(int(c) for c in cids[order[:n_probe]])
        assign = self.spark.read.parquet(os.path.join(self.root, "assign"))
        cand = assign.filter(F.col("cid").isin(probed))
        return pq_adc_topk(cand, query_vec, codebooks, k=k, id_col="vec_id")

    def topk_batch(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        query_id_col: str = "query_id",
        query_vec_col: str = "qvec",
    ) -> DataFrame:
        """Batch-scoring twin of :meth:`topk` for LARGE query sets —
        the IVF-PQ counterpart of IvfIndex.topk_batch: the query set is
        never collected driver-side. Coarse centroids and PQ codebooks
        (both constant-size) ship in kernel closures; an Arrow-batched
        mapInPandas picks each query's ``n_probe`` coarse clusters
        executor-side; the bounded probed-cid set prunes the assign
        scan; and a cid-cogrouped applyInPandas scores each cluster's
        codes against its queries' ADC tables (exact int64 — the same
        arithmetic as pq_adc_topk's JVM expression, so results are
        identical per query; pinned by test). ``query_vec_col`` holds
        RAW float vectors, like :meth:`topk`'s argument."""
        import json
        import os

        import numpy as np
        import pandas as pd

        with open(self._meta_path()) as f:
            meta = json.load(f)
        cids = np.asarray(meta["cids"], dtype=np.int64)
        CENT = np.asarray(meta["centroids"], dtype=np.int64)
        cb = [np.array(c, dtype=np.int64) for c in meta["codebooks"]]
        dim = CENT.shape[1]
        slices = _sub_slices(dim, len(cb))

        # pin the query lineage once: probe assignment and the vector
        # join-back must see the same rows (nondeterministic sources)
        queries = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qvec"),
        ).localCheckpoint(eager=False)

        def _quant(col) -> "np.ndarray":
            return np.floor(
                np.stack([np.asarray(v, dtype=np.float64) for v in col])
                * 1_000_000.0
                + 0.5
            ).astype(np.int64)

        def assign_probes(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                Q = _quant(pdf["qvec"].to_numpy())
                d = ((Q[:, None, :] - CENT[None, :, :]) ** 2).sum(axis=2)
                # stable argsort over cid-ascending columns == the
                # per-query lexsort((cids, d)): dist ASC, cid ASC
                order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
                reps = order.shape[1]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(
                            pdf["query_id"].to_numpy(), reps
                        ),
                        "cid": cids[order].ravel(),
                    }
                )

        pairs = queries.mapInPandas(
            assign_probes, schema="query_id long, cid long"
        ).localCheckpoint(eager=True)
        probed = sorted(
            r["cid"] for r in pairs.select("cid").distinct().collect()
        )
        assign = self.spark.read.parquet(os.path.join(self.root, "assign"))
        cand = assign.filter(F.col("cid").isin(probed)).select(
            F.col("vec_id"), F.col("codes"), F.col("cid").cast("long").alias("cid")
        )
        qside = pairs.join(queries, "query_id")

        def score_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "vec_id": pd.Series(dtype="int64"),
                 "adc_dist": pd.Series(dtype="int64")}
            )
            if left.empty or right.empty:
                return empty
            right = right.sort_values("vec_id")  # vec_id ASC tie-break
            vids = right["vec_id"].to_numpy()
            C = np.stack(right["codes"].to_numpy()).astype(np.int64)
            out = []
            kk = min(k, len(vids))
            for lo in range(0, len(left), 2048):
                chunk = left.iloc[lo : lo + 2048]
                Q = _quant(chunk["qvec"].to_numpy())
                # ADC tables per query: (q, m, kcent) exact int64
                dist = np.zeros((len(Q), len(vids)), dtype=np.int64)
                for s_i, (s, ln) in enumerate(slices):
                    sub = Q[:, s : s + ln]  # (q, ln)
                    # (q, kcent) squared dists of every query sub to
                    # this subspace's centroids
                    dt = (
                        (sub[:, None, :] - cb[s_i][None, :, :]) ** 2
                    ).sum(axis=2)
                    dist += dt[:, C[:, s_i]]
                top = np.argsort(dist, axis=1, kind="stable")[:, :kk]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(
                                chunk["query_id"].to_numpy(), kk
                            ),
                            "vec_id": vids[top].ravel(),
                            "adc_dist": np.take_along_axis(
                                dist, top, axis=1
                            ).ravel(),
                        }
                    )
                )
            return pd.concat(out, ignore_index=True) if out else empty

        scored = (
            qside.groupBy("cid")
            .cogroup(cand.groupBy("cid"))
            .applyInPandas(
                score_group, schema="query_id long, vec_id long, adc_dist long"
            )
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("adc_dist"), F.col("vec_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "vec_id", "adc_dist", "rnk")
        )
