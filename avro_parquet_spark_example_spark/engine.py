"""User-facing engine facade.

The reference was a program you edited; this engine is a library you call.
``Engine`` wires the pieces — configured session, table catalog, SQL entry
point, Avro-schema'd reads, format sinks, and the LLM-pipeline operators —
behind one object, so a user of the reference's workflow (define schema →
write Parquet → register → query) maps each step 1:1:

    from avro_parquet_spark_example_spark.engine import Engine

    eng = Engine(sf_dir="/root/testdata/sf0.01")
    eng.table("lineitem").groupBy("l_returnflag").count().show()
    eng.sql("SELECT COUNT(*) FROM orders").show()
    users = eng.read_with_avro_schema(schema_json, "/data/users.parquet")
    clusters = eng.dedup_near(eng.table("documents"))
    hits = eng.search_topk(eng.table("embeddings"), query_vec, k=10)

Every method returns a plain DataFrame — compose freely with the DataFrame
API; nothing here materializes data.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
)
from avro_parquet_spark_example_spark.operators.curation import (
    dsir_selected,
    temperature_selection,
)
from avro_parquet_spark_example_spark.operators.dedup import (
    connected_components,
    incremental_minhash_matches,
    keep_first_per_text,
    minhash_candidate_pairs,
    minhash_clusters,
    semantic_cell_dropped,
    simhash64,
    substring_dup_spans,
)
from avro_parquet_spark_example_spark.operators.simsearch import (
    dot_product,
    sql_double_array,
)
from avro_parquet_spark_example_spark.session import configure, get_session
from avro_parquet_spark_example_spark.sources import catalog
from avro_parquet_spark_example_spark.sources.avro_schema import parse_avro_schema


class Engine:
    """A configured session + catalog + operator library."""

    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = configure(spark) if spark is not None else get_session()
        self.sf_dir = sf_dir

    # -- catalog / entry points ------------------------------------------

    def table(self, name: str) -> DataFrame:
        """A catalog table (events arrives time-normalized)."""
        if self.sf_dir is None:
            raise ValueError("Engine(sf_dir=...) required for table access")
        return catalog.load(self.spark, self.sf_dir, name)

    def sql(self, text: str) -> DataFrame:
        """ANSI SQL over the catalog tables.

        Views are (re-)registered on every call: temp views are
        session-global, so two Engines with different ``sf_dir`` sharing one
        session would otherwise read each other's registrations. Re-pointing
        a view is metadata-only (the underlying DataFrames are cached).
        """
        if self.sf_dir is not None:
            catalog.register_views(self.spark, self.sf_dir)
        return self.spark.sql(text)

    def read_parquet(self, path: str) -> DataFrame:
        return self.spark.read.parquet(path)

    def read_with_avro_schema(self, avro_schema: str | dict, path: str) -> DataFrame:
        """Declared-schema Parquet read: the Avro document is the contract,
        the file footer is not consulted (the reference's core pattern)."""
        return self.spark.read.schema(parse_avro_schema(avro_schema)).parquet(path)

    def write_parquet(
        self,
        df: DataFrame,
        path: str,
        partition_by: str | list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        writer = df.write.mode(mode)
        if partition_by:
            cols = [partition_by] if isinstance(partition_by, str) else partition_by
            writer = writer.partitionBy(*cols)
        writer.parquet(path)

    # -- LLM-pipeline operators ------------------------------------------

    def dedup_exact(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """Keep the lowest-id row per normalized-text group (shared
        implementation with the oracle-checked ``dedup_exact`` operator)."""
        return keep_first_per_text(df, text_col=text_col, id_col=id_col)

    def dedup_near(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.7,
        collapse_exact: bool = True,
    ) -> DataFrame:
        """(id, cluster_id) for near-duplicate documents via MinHash+LSH +
        connected components. Rows not in any cluster are absent (keep them
        all); drop every id whose cluster_id != id to dedup.
        ``collapse_exact`` (default) runs the value-exact production
        composition — exact duplicates collapse to their representative
        before the near-dup pipeline, so cost tracks the CANONICAL corpus
        at any duplicate rate (see SCALING.md "exact-dup-rate boundary")."""
        return minhash_clusters(
            df,
            id_col=id_col,
            text_col=text_col,
            sim_threshold=threshold,
            collapse_exact=collapse_exact,
        )

    def dedup_semantic(
        self,
        df: DataFrame,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
        threshold: float = 0.35,
        n_bits: int = 6,
    ) -> DataFrame:
        """SemDeDup-shaped semantic dedup: rows DROPPED because a lower-id
        vector in the same sign-bit cell has cosine >= threshold, as
        (id, cell, kept_for). Anti-join ``df`` against the result to keep
        the survivors (shared implementation with the oracle-checked
        ``dedup_semantic_cell`` operator)."""
        return semantic_cell_dropped(
            df, emb_col=emb_col, id_col=id_col, threshold=threshold, n_bits=n_bits
        )

    def dedup_incremental(
        self,
        corpus: DataFrame,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.7,
    ) -> DataFrame:
        """Near-dup matches of a NEW batch against the EXISTING corpus as
        (corpus_id, batch_id, jaccard) — only the batch is shingled/signed
        and the band join is corpus×batch, so ingest cost scales with the
        batch (shared implementation with ``dedup_minhash_incremental``).
        Anti-join ``batch`` on batch_id to admit only novel documents."""
        return incremental_minhash_matches(
            corpus, batch, id_col=id_col, text_col=text_col,
            jaccard_threshold=threshold,
        )

    def resample_temperature(
        self,
        df: DataFrame,
        domain_col: str,
        id_col: str = "doc_id",
        alpha: float = 0.5,
        budget: float = 0.6,
    ) -> DataFrame:
        """Deterministic temperature-scaled mixture resample: keep each row
        with per-domain probability from p^alpha renormalization times the
        budget, decided by an md5-uniform draw on ``id_col`` (stable under
        reruns and incremental ingestion; shared implementation with
        ``mixture_temperature_resample``)."""
        sel = temperature_selection(
            df, domain_col=domain_col, id_col=id_col, alpha=alpha,
            budget_frac=budget,
        )
        return sel.filter(F.col("__selected")).select(*df.columns)

    def select_dsir(
        self,
        df: DataFrame,
        is_target: Column,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """DSIR importance selection: docs whose average per-token log-ratio
        of the target unigram distribution (rows where ``is_target``) vs the
        raw corpus favors the target, as (id, n_tok, avg_log_ratio) — join
        back on ``id_col`` for the selected documents (shared implementation
        with ``curation_dsir_importance``)."""
        return dsir_selected(df, is_target, text_col=text_col, id_col=id_col)

    def simhash(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        """Append a 64-bit SimHash ``fingerprint`` column."""
        return df.withColumn("fingerprint", simhash64(F.col(text_col)))

    def dedup_substrings(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 8,
    ) -> DataFrame:
        """Merged token spans (id, span_start, span_end) of every k-token
        window that occurred earlier in the corpus — the Lee-et-al-2022
        substring-dedup cut list (shared implementation with the
        oracle-checked ``dedup_substring_spans`` operator)."""
        return substring_dup_spans(df, id_col=id_col, text_col=text_col, k=k)

    def search_topk(
        self,
        df: DataFrame,
        query_vec: list[float],
        k: int = 10,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> DataFrame:
        """Exact cosine top-k against a literal query vector (unit-norm
        corpus ⇒ dot == cosine). Plans TakeOrderedAndProject — per-partition
        heaps, no global sort."""
        return (
            df.withColumn(
                "score",
                dot_product(f"`{vec_col}`", sql_double_array(query_vec)),
            )
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
        )

    def cluster(
        self,
        df: DataFrame,
        k: int = 8,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> DataFrame:
        """(id, cluster, sq_dist) via iterative k-means; only the k×dim
        centroids ever reach the driver (operators/clustering.py)."""
        vectors = df.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        )
        centroids, _ = kmeans_fit(vectors, k=k)
        return assign_clusters(vectors, centroids).select(
            F.col("vec_id").alias(id_col), "cluster", "sq_dist"
        )

    def redact_pii(
        self,
        df: DataFrame,
        text_col: str = "text",
        extra_patterns: list[str] | None = None,
    ) -> DataFrame:
        """Mask emails/phones (plus caller-supplied regexes) in ``text_col``
        — zero-shuffle regex map, the pre-release scrub pass."""
        email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
        phone = r"\d{3}[-.]?\d{3}[-.]?\d{4}"
        out = F.regexp_replace(
            F.regexp_replace(F.col(text_col), email, "[EMAIL]"), phone, "[PHONE]"
        )
        for pat in extra_patterns or []:
            out = F.regexp_replace(out, pat, "[REDACTED]")
        return df.withColumn(text_col, out)

    def split(
        self,
        df: DataFrame,
        id_col: str = "doc_id",
        weights: tuple[int, int, int] = (12, 2, 2),
    ) -> DataFrame:
        """Append a deterministic ``split`` column (train/val/test) from the
        md5 hex space of ``id_col`` — stable under reruns and ingestion,
        unlike fraction sampling. ``weights`` partition the 16 hex buckets."""
        t, v, s = weights
        if t + v + s != 16 or min(t, v, s) < 1:
            raise ValueError("weights must be ≥1 each and sum to 16")
        hexchars = "0123456789abcdef"
        first_hex = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
        split = (
            F.when(first_hex.isin(*hexchars[:t]), "train")
            .when(first_hex.isin(*hexchars[t : t + v]), "val")
            .otherwise("test")
        )
        return df.withColumn("split", split)

    def chunk(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        chunk: int = 200,
        stride: int = 150,
    ) -> DataFrame:
        """(id, chunk_id, chunk, chunk_len) sliding-window pieces of each
        document — map-only, zero shuffle (operators/curation.py)."""
        from avro_parquet_spark_example_spark.operators.curation import (
            chunk_documents,
        )

        return chunk_documents(
            df, text_col=text_col, id_col=id_col, chunk=chunk, stride=stride
        )

    def shuffle_export(
        self, df: DataFrame, id_col: str = "doc_id", seed: int = 42
    ) -> DataFrame:
        """Key rows with the deterministic seeded ``shuffle_key`` + 16-way
        ``shard`` and return them repartitioned by shard, sorted by key
        within each shard — ready for a sharded training-set write; re-runs
        with the same seed reproduce the byte order exactly."""
        from avro_parquet_spark_example_spark.operators.curation import (
            shard_for_export,
        )

        keyed = shard_for_export(df, id_col=id_col, seed=seed)
        return keyed.repartition("shard").sortWithinPartitions(
            "shuffle_key", id_col
        )

    # -- graph / retrieval (round-5 continuation additions) ---------------

    def cooccurrence_graph(
        self, max_user: int | None = None
    ) -> DataFrame:
        """Oriented (u < v) co-occurrence edges over the catalog's events
        table — same (type, 5-minute) bucket (operators/graph.py)."""
        from avro_parquet_spark_example_spark.operators.graph import (
            cooccurrence_edges,
        )

        if self.sf_dir is None:
            raise ValueError("Engine(sf_dir=...) required for table access")
        return cooccurrence_edges(self.spark, self.sf_dir, max_user=max_user)

    def pagerank(
        self, edges: DataFrame, damping: float = 0.85, iters: int = 10
    ) -> DataFrame:
        """(node, rank) PageRank over oriented (u, v) edges — power
        iteration, two key-partitioned shuffles per round, no driver
        state (operators/graph.py)."""
        from avro_parquet_spark_example_spark.operators.graph import pagerank_edges

        return pagerank_edges(edges, damping=damping, iters=iters)

    def triangles(self, edges: DataFrame) -> DataFrame:
        """(node, n_triangles) over oriented (u < v) edges — ordered
        edge-join, each triangle found once (operators/graph.py)."""
        from avro_parquet_spark_example_spark.operators.graph import triangle_counts

        return triangle_counts(edges)

    def sparse_topk(
        self,
        docs: DataFrame,
        query_doc_id: int,
        k: int = 10,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Sparse lexical retrieval: tf-cosine top-k against one document
        via the inverted-index posting-list join — only documents sharing
        a term are touched (operators/text_analysis.py)."""
        from avro_parquet_spark_example_spark.operators.text_analysis import (
            sparse_cosine_topk,
        )

        return sparse_cosine_topk(
            docs, query_doc_id, k=k, text_col=text_col, id_col=id_col
        )

    def quality_gate(
        self, df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None
    ) -> DataFrame:
        """Gopher-style quality signals + per-rule flags + ``keep`` verdict
        (operators/curation.py; callers filter NULL text first)."""
        from avro_parquet_spark_example_spark.operators.curation import (
            gopher_quality_flags,
        )

        return gopher_quality_flags(df, text_col=text_col, id_cols=id_cols)

    def blocklist_filter(
        self,
        df: DataFrame,
        terms,
        text_col: str = "text",
        id_cols: list[str] | None = None,
    ) -> DataFrame:
        """Term-blocklist density verdict with matched-term attribution
        (operators/curation.py)."""
        from avro_parquet_spark_example_spark.operators.curation import (
            blocklist_flags,
        )

        return blocklist_flags(df, terms, text_col=text_col, id_cols=id_cols)

    def sessionize(
        self,
        ev: DataFrame,
        user_col: str = "u",
        ts_col: str = "ts",
        gap_us: int | None = None,
        cap_us: int | None = None,
    ) -> DataFrame:
        """Gap + max-duration capped sessions over an epoch-µs stream
        (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            SESS_CAP_US,
            SESS_GAP_US,
            sessionize_capped,
        )

        return sessionize_capped(
            ev,
            user_col=user_col,
            ts_col=ts_col,
            gap_us=gap_us if gap_us is not None else SESS_GAP_US,
            cap_us=cap_us if cap_us is not None else SESS_CAP_US,
        )

    def bfs(self, sym_edges: DataFrame, seeds: DataFrame, hops: int = 3) -> DataFrame:
        """Bounded multi-source BFS hop distances over symmetrized
        (src, dst) edges (operators/graph.py)."""
        from avro_parquet_spark_example_spark.operators.graph import bfs_hops

        return bfs_hops(sym_edges, seeds, hops=hops)

    def resolve_entities(
        self,
        records: DataFrame,
        max_lev: int = 2,
        block_tail: int = 6,
        max_block_size: int | None = None,
        on_oversized: str = "drop",
    ) -> DataFrame:
        """(id, cluster_id, is_golden) entity clusters over an (id, name)
        record frame: suffix blocking + exact-Levenshtein candidate match
        (operators/entity.py, with the engine's standard per-block skew
        cap) closed transitively with the shared connected-components.
        Drop every id whose cluster_id != id to keep golden records."""
        from avro_parquet_spark_example_spark.operators.dedup import (
            connected_components,
        )
        from avro_parquet_spark_example_spark.operators.entity import (
            ER_MAX_BLOCK,
            blocked_match_pairs,
        )

        pairs = blocked_match_pairs(
            records,
            max_lev=max_lev,
            block_tail=block_tail,
            max_block_size=(
                ER_MAX_BLOCK if max_block_size is None else max_block_size
            ),
            on_oversized=on_oversized,
        ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        cc = connected_components(pairs)
        return cc.select(
            "id",
            "cluster_id",
            (F.col("cluster_id") == F.col("id")).alias("is_golden"),
        )

    def knn_graph(
        self,
        vectors: DataFrame,
        k: int = 3,
        n_anchors: int = 8,
        nprobe: int = 3,
        exact: bool = False,
    ) -> DataFrame:
        """(src, dst, rnk, score) k-nearest-neighbor graph over a
        (vec_id, embedding) frame via the IVF-cell-blocked candidate
        join (operators/simsearch.py). ``exact=True`` degenerates the
        quantizer to ONE cell (n_anchors=1) — the all-pairs exact graph
        through the identical code path, for bounded pools."""
        from avro_parquet_spark_example_spark.operators.simsearch import (
            knn_graph_ivf,
        )

        if exact:
            n_anchors, nprobe = 1, 1
        return knn_graph_ivf(
            vectors, n_anchors=n_anchors, nprobe=nprobe, k=k
        )

    def silhouette(
        self,
        vectors: DataFrame,
        sample_hex: str | None = None,
        target_count: int | None = None,
        pool_rows: int | None = None,
    ) -> DataFrame:
        """(vec_id, label, a_intra, b_inter, silhouette) — exact
        Rousseeuw silhouette of a (vec_id, label, embedding) cluster
        assignment. ``sample_hex`` (e.g. "4000" ≈ 25%) applies the
        deterministic md5-uniform sample — the at-scale form; None runs
        the exact all-pairs on the caller-bounded pool.
        ``target_count`` is the production dial (VERDICT r10 task #3):
        the threshold is computed from an absolute sample SIZE, so the
        quadratic stage stays the same cost as the corpus grows.

        NOTE (exception to the lazy-facade rule): deriving the
        threshold from ``target_count`` needs the corpus size, so this
        method runs an eager ``vectors.count()`` — one full action on
        the input — unless the caller supplies ``pool_rows`` (the known
        or estimated corpus row count), which keeps the call fully
        lazy (ADVICE r11 #3)."""
        from avro_parquet_spark_example_spark.operators.simsearch import (
            cluster_silhouette,
            silhouette_sample_hex,
        )

        if target_count is not None:
            if sample_hex is not None:
                raise ValueError(
                    "pass sample_hex or target_count, not both"
                )
            sample_hex = silhouette_sample_hex(
                pool_rows if pool_rows is not None else vectors.count(),
                target_count,
            )
        if sample_hex is not None:
            # Compare a prefix of the SAME length as the threshold —
            # a hardcoded 4 would silently turn '40000' into a 4-digit
            # prefix comparison and shift the sample fraction
            # (ADVICE r10 #2).
            if not re.fullmatch(r"[0-9a-f]+", sample_hex):
                raise ValueError(
                    f"sample_hex must be lowercase hex, got {sample_hex!r}"
                )
            vectors = vectors.filter(
                F.substring(
                    F.md5(F.col("vec_id").cast("string")),
                    1,
                    len(sample_hex),
                )
                < F.lit(sample_hex)
            )
        return cluster_silhouette(vectors)

    def project_bipartite(
        self,
        memberships: DataFrame,
        max_part_degree: int | None = None,
        on_oversized: str = "drop",
        min_shared: int = 2,
    ) -> DataFrame:
        """(s1, s2, co_parts) co-membership projection of a DISTINCT
        (part, supp) incidence frame (operators/graph.py), per-part
        degree bounded by the engine's standard drop|error|split cap."""
        from avro_parquet_spark_example_spark.operators.graph import (
            BIPART_MAX_DEGREE,
            bipartite_project,
        )

        return bipartite_project(
            memberships,
            max_part_degree=(
                BIPART_MAX_DEGREE
                if max_part_degree is None
                else max_part_degree
            ),
            on_oversized=on_oversized,
            min_shared=min_shared,
        )

    def kcenter_seeds(
        self, vectors: DataFrame, k: int | None = None
    ) -> DataFrame:
        """(sel_rank, vec_id, radius7) — deterministic greedy k-center
        (farthest-point) seeding of a (vec_id, embedding) frame
        (operators/clustering.py); the RNG-free k-means++ stand-in whose
        radius column doubles as the pick-k diagnostic."""
        from avro_parquet_spark_example_spark.operators.clustering import (
            KCENTER_K,
            kcenter_greedy,
        )

        return kcenter_greedy(
            vectors, k=KCENTER_K if k is None else k
        )

    def clustering_coefficients(self, edges: DataFrame) -> DataFrame:
        """(node, degree, n_triangles, local_cc) — per-node local
        clustering coefficients of an oriented (u < v) edge frame
        (operators/graph.py); degree-1 nodes are excluded (undefined
        denominator)."""
        from avro_parquet_spark_example_spark.operators.graph import (
            local_clustering_coefficients,
        )

        return local_clustering_coefficients(edges)

    def spearman(
        self, df: DataFrame, x: str, y: str, group: str
    ) -> DataFrame:
        """(grp, n, spearman_rho) — exact average-rank Spearman
        correlation of two bounded-domain columns per group
        (operators/aggregates.py; quantize continuous columns first)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            spearman_rho,
        )

        return spearman_rho(df, x=x, y=y, group=group)

    def kendall(
        self, df: DataFrame, x: str, y: str, group: str
    ) -> DataFrame:
        """(grp, n, kendall_tau_b) — exact tie-corrected Kendall tau-b of
        two bounded-domain columns per group (operators/aggregates.py)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            kendall_tau_b,
        )

        return kendall_tau_b(df, x=x, y=y, group=group)

    def mutual_information(
        self, df: DataFrame, x: str, y: str, segment: str
    ) -> DataFrame:
        """(seg, n, mi_nats) — exact categorical mutual information per
        segment (operators/aggregates.py)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            mutual_information,
        )

        return mutual_information(df, x=x, y=y, segment=segment)

    def hhi(self, df: DataFrame, group: str, amount: str) -> DataFrame:
        """(group, n_members, hhi12, hhi) — Herfindahl–Hirschman
        concentration over per-member exact integer amounts
        (operators/aggregates.py)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            hhi_index,
        )

        return hhi_index(df, group=group, amount=amount)

    def decision_stump(
        self, df: DataFrame, feature: str, target: str
    ) -> DataFrame:
        """(threshold, n_left, pos_left, gain12, is_best) — exact
        information-gain split search of a bounded-domain feature against
        a boolean target column (operators/features.py)."""
        from avro_parquet_spark_example_spark.operators.features import (
            decision_stump,
        )

        return decision_stump(
            df.select(
                F.col(feature).alias("v"), F.col(target).alias("is_ref")
            )
        )

    def percent_rank_cume(
        self, df: DataFrame, partition_by: str, order_by: str
    ) -> DataFrame:
        """(partition_by, order_by, pr, cd) — exact PERCENT_RANK /
        CUME_DIST per partition class via the domain-sized frequency
        matrix, no full-table window (operators/windows.py); quantize
        continuous order columns first."""
        from avro_parquet_spark_example_spark.operators.windows import (
            percent_rank_cume,
        )

        return percent_rank_cume(
            df, partition_by=partition_by, order_by=order_by
        )

    def cramers_v(self, df: DataFrame, x: str, y: str) -> DataFrame:
        """(n, chi2, cramers_v) — Cramér's V effect size of the x × y
        contingency table (operators/aggregates.py); bounded domains."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            cramers_v,
        )

        return cramers_v(df, x=x, y=y)

    def cusum(
        self, daily: DataFrame, key: str, order: str, value: str
    ) -> DataFrame:
        """(key, n_days, cusum_max, peak_day) — one-sided Page CUSUM
        drift detector over a keyed (DATE-ordered) integral series
        (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            cusum_drift,
        )

        return cusum_drift(daily, key=key, order=order, value=value)

    def rolling_median(
        self,
        daily: DataFrame,
        key: str,
        order: str,
        value: str,
        half_window: int = 3,
    ) -> DataFrame:
        """(key, order, value, med{W}) — centered W-point rolling median
        of a keyed ordered integral series (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            rolling_median,
        )

        return rolling_median(
            daily, key=key, order=order, value=value, half_window=half_window
        )

    def lead_lag_xcorr(
        self, lead: DataFrame, lagging: DataFrame, max_lag: int = 3
    ) -> DataFrame:
        """(lag, n_days, xcorr) — Pearson cross-correlation of two
        (day, x) daily integral series at every lag in ±max_lag
        (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            lead_lag_xcorr,
        )

        return lead_lag_xcorr(lead, lagging, max_lag=max_lag)

    def anova(
        self, df: DataFrame, segment: str, group: str, value: str
    ) -> DataFrame:
        """(segment, k, n_obs, f_stat) — one-way ANOVA F of an integral
        value across group levels, per segment
        (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            anova_oneway,
        )

        return anova_oneway(df, segment=segment, group=group, value=value)

    def log_odds(
        self,
        df: DataFrame,
        text: str,
        flag: str,
        aw: float | None = None,
        min_count: int | None = None,
    ) -> DataFrame:
        """(w, ya, yb, z) — Monroe "fightin' words" log-odds z-scores of
        flag-true vs flag-false word usage
        (operators/text_analysis.py)."""
        from avro_parquet_spark_example_spark.operators.text_analysis import (
            MONROE_AW,
            MONROE_MIN_COUNT,
            log_odds_monroe,
        )

        return log_odds_monroe(
            df,
            text=text,
            flag=flag,
            aw=MONROE_AW if aw is None else aw,
            min_count=MONROE_MIN_COUNT if min_count is None else min_count,
        )

    def ttr_hapax(self, df: DataFrame, text: str, group: str) -> DataFrame:
        """(group, n_tokens, n_types, n_hapax, ttr, hapax_share) —
        lexical-richness profile per group
        (operators/text_analysis.py)."""
        from avro_parquet_spark_example_spark.operators.text_analysis import (
            ttr_hapax,
        )

        return ttr_hapax(df, text=text, group=group)

    def assortativity(self, edges: DataFrame) -> DataFrame:
        """(n_edges, assortativity) — Newman degree assortativity of an
        undirected (u, v) edge frame (operators/graph.py)."""
        from avro_parquet_spark_example_spark.operators.graph import (
            degree_assortativity,
        )

        return degree_assortativity(edges)

    def confusion(
        self,
        df: DataFrame,
        id_col: str = "vec_id",
        label_col: str = "label",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """(true_label, pred_label, n) — nearest-centroid confusion
        matrix of an (id, label, vector) frame
        (operators/simsearch.py)."""
        from avro_parquet_spark_example_spark.operators.simsearch import (
            nearest_centroid_confusion,
        )

        return nearest_centroid_confusion(
            df, id_col=id_col, label_col=label_col, vec_col=vec_col
        )

    def kappa(self, conf: DataFrame) -> DataFrame:
        """(n, diag, observed_agreement, kappa) — Cohen's kappa over a
        (true_label, pred_label, n) confusion-count frame
        (operators/simsearch.py)."""
        from avro_parquet_spark_example_spark.operators.simsearch import (
            cohens_kappa,
        )

        return cohens_kappa(conf)

    def quantile_bands(
        self,
        df: DataFrame,
        group: str,
        value: str,
        bands: tuple[int, ...] = (25, 50, 75, 90),
    ) -> DataFrame:
        """(grp, n, p{q}...) — exact type-1 quantiles of an integral
        bounded-domain value column per group, computed from the
        value-domain matrix with no per-row sort
        (operators/aggregates.py)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            quantile_bands,
        )

        return quantile_bands(df, group=group, value=value, bands=bands)

    def trimmed_mean(
        self, df: DataFrame, group: str, value: str, trim_denom: int = 20
    ) -> DataFrame:
        """(grp, n, n_trim, trimmed_mean, winsorized_mean) — robust
        location estimates per group, ⌊n/trim_denom⌋ trimmed each side
        (operators/aggregates.py)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            trimmed_winsorized_mean,
        )

        return trimmed_winsorized_mean(
            df, group=group, value=value, trim_denom=trim_denom
        )

    def mad(self, df: DataFrame, group: str, value: str) -> DataFrame:
        """(grp, n, median, mad) — exact type-1 median and MAD per group
        (operators/aggregates.py)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            mad_robust,
        )

        return mad_robust(df, group=group, value=value)

    def outlier_flags(
        self, df: DataFrame, group: str, value: str, k: int = 3
    ) -> DataFrame:
        """(grp, n, n_outlier, outlier_share) — Hampel-style |v−median| >
        k·MAD outlier census per group (operators/aggregates.py)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            outlier_flags,
        )

        return outlier_flags(df, group=group, value=value, k=k)

    def hl_shift(
        self, dfx: DataFrame, dfy: DataFrame, value: str
    ) -> DataFrame:
        """(n_x, n_y, hl_shift) — Hodges-Lehmann two-sample shift
        estimate via histogram convolution (operators/aggregates.py)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            hl_shift,
        )

        return hl_shift(dfx, dfy, value=value)

    def autocorr(
        self,
        daily: DataFrame,
        key: str,
        order: str,
        value: str,
        max_lag: int = 7,
    ) -> DataFrame:
        """(key, lag, n_days, acf) — lag-k autocorrelation of a keyed
        daily integral series, k = 0..max_lag
        (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            autocorr,
        )

        return autocorr(
            daily, key=key, order=order, value=value, max_lag=max_lag
        )

    def theil_sen(
        self, daily: DataFrame, key: str, order: str, value: str
    ) -> DataFrame:
        """(key, n_pairs, sen_slope) — Theil-Sen robust median trend
        slope of a keyed daily integral series
        (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            theil_sen,
        )

        return theil_sen(daily, key=key, order=order, value=value)

    def calibration_error(
        self, df: DataFrame, pred: str, outcome: str, prob_denom: int
    ) -> DataFrame:
        """(n_bins, n, ece) — expected calibration error of an integral
        predictor (prob = pred/prob_denom) vs a 0/1 outcome
        (operators/projection.py)."""
        from avro_parquet_spark_example_spark.operators.projection import (
            calibration_error,
        )

        return calibration_error(
            df, pred=pred, outcome=outcome, prob_denom=prob_denom
        )

    def brier(
        self, df: DataFrame, pred: str, outcome: str, prob_denom: int
    ) -> DataFrame:
        """(n, brier) — Brier score of an integral predictor (prob =
        pred/prob_denom) vs a 0/1 outcome (operators/projection.py)."""
        from avro_parquet_spark_example_spark.operators.projection import (
            brier_score,
        )

        return brier_score(
            df, pred=pred, outcome=outcome, prob_denom=prob_denom
        )

    def fano(self, daily: DataFrame, key: str, value: str) -> DataFrame:
        """(key, n_days, mean_daily, fano) — Fano factor (variance/mean)
        burstiness index of a keyed integral series
        (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            fano_factor,
        )

        return fano_factor(daily, key=key, value=value)

    def column_profile(
        self,
        df: DataFrame,
        columns: tuple[str, ...] | list[str],
        rendered: dict | None = None,
    ) -> DataFrame:
        """(col_name, n, n_null, n_distinct, min_s, max_s) — per-column
        dataset-card profile in one aggregate pass
        (operators/projection.py)."""
        from avro_parquet_spark_example_spark.operators.projection import (
            column_profile,
        )

        return column_profile(df, columns, rendered=rendered)

    def cluster_size_histogram(
        self, df: DataFrame, text_col: str = "text"
    ) -> DataFrame:
        """(cluster_size, n_clusters, n_docs) — exact-dup group-size
        histogram by the canonical normalized-text key
        (operators/dedup.py)."""
        from avro_parquet_spark_example_spark.operators.dedup import (
            cluster_size_histogram,
        )

        return cluster_size_histogram(df, text_col=text_col)

    def dim_variance(
        self, df: DataFrame, vec_col: str = "embedding"
    ) -> DataFrame:
        """(pos, n, variance) — exact per-dimension population variance
        of a vector column (operators/simsearch.py); order/limit for a
        top-k screen."""
        from avro_parquet_spark_example_spark.operators.simsearch import (
            dim_variance,
        )

        return dim_variance(df, vec_col=vec_col)

    def mcc(self, conf: DataFrame) -> DataFrame:
        """(n, corr, mcc) — Gorodkin multiclass Matthews correlation over
        a (true_label, pred_label, n) confusion-count frame
        (operators/simsearch.py); Σt_k²/Σp_k² from each marginal alone
        so never-predicted classes keep their terms."""
        from avro_parquet_spark_example_spark.operators.simsearch import (
            mcc_multiclass,
        )

        return mcc_multiclass(conf)

    def pass_at_k(self, per: DataFrame) -> DataFrame:
        """(k, n_problems, mean_pass) — unbiased pass@k over a
        per-problem frame with integer columns ``n`` (samples) and
        ``c`` (passes) (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            pass_at_k,
        )

        return pass_at_k(per)

    def fleiss_kappa(
        self, ratings: DataFrame, item: str, category: str, n_raters: int
    ) -> DataFrame:
        """(n_items, n_raters, p_bar, p_e, kappa) — Fleiss' multi-rater
        agreement over a ratings frame with exactly n_raters rows per
        item (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            fleiss_kappa,
        )

        return fleiss_kappa(
            ratings, item=item, category=category, n_raters=n_raters
        )

    def jackknife_se(
        self, per: DataFrame, scale: float = 10000.0
    ) -> DataFrame:
        """(n_clusters, theta_hat, jackknife_se) — delete-one-cluster
        jackknife SE from per-cluster iusum sums ``su`` and counts
        ``cnt`` (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            jackknife_ratio_se,
        )

        return jackknife_ratio_se(per, scale=scale)

    def poisson_bootstrap(
        self, rows: DataFrame, scale: float = 10000.0
    ) -> DataFrame:
        """(event_type, n_rows, mean_value, ci_lo, ci_hi) — Poisson-
        bootstrap 95% CI over a (event_type, event_id, q) quantized
        frame (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            poisson_bootstrap_ci,
        )

        return poisson_bootstrap_ci(rows, scale=scale)

    def effect_sizes(self, e: DataFrame) -> DataFrame:
        """(event_type, n_weekend, n_weekday, cohens_d, hedges_g,
        cliffs_delta) — over a (event_type, wk∈{0,1}, q int) two-sample
        frame (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            effect_sizes,
        )

        return effect_sizes(e)

    def power_mde(self, e: DataFrame) -> DataFrame:
        """(event_type, n_weekend, n_weekday, pooled_sd, mde_abs,
        mde_rel) — minimal detectable effect at α=0.05/power 0.8 over
        the same two-sample frame shape as effect_sizes
        (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            power_mde,
        )

        return power_mde(e)

    def bradley_terry(self, wins: DataFrame) -> DataFrame:
        """(event_type, wins, games, pi9, rating) — Bradley-Terry MM
        strengths + Elo-scale ratings from an (i, j, nij) ordered duel
        frame (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            bradley_terry,
        )

        return bradley_terry(wins)

    def forecast_backtest(
        self,
        daily: DataFrame,
        key: str,
        order: str,
        value: str,
        season: int = 7,
    ) -> DataFrame:
        """(key, n_days, mae, rmse, mape, smape, mase) — seasonal-naive
        backtest metrics over a keyed DATE-grid integer series
        (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            forecast_backtest,
        )

        return forecast_backtest(
            daily, key=key, order=order, value=value, season=season
        )

    def bleu_corpus(
        self,
        pairs: DataFrame,
        group: str = "lang",
        pair: str = "doc_id",
        cand: str = "cand",
        ref: str = "ref",
    ) -> DataFrame:
        """(group, n_pairs, c_len, r_len, p1, p2, bp, bleu2) — corpus
        BLEU-2 over a (group, pair-id, candidate, reference) text-pair
        frame (operators/text_analysis.py)."""
        from avro_parquet_spark_example_spark.operators.text_analysis import (
            bleu_corpus,
        )

        return bleu_corpus(pairs, group=group, pair=pair, cand=cand, ref=ref)

    def rouge_n(
        self,
        pairs: DataFrame,
        group: str = "lang",
        pair: str = "doc_id",
        cand: str = "cand",
        ref: str = "ref",
    ) -> DataFrame:
        """(group, n_pairs, rouge1/2 recall/precision/f1) — corpus
        ROUGE-1/ROUGE-2 over the same text-pair frame shape as
        bleu_corpus (operators/text_analysis.py)."""
        from avro_parquet_spark_example_spark.operators.text_analysis import (
            rouge_n,
        )

        return rouge_n(pairs, group=group, pair=pair, cand=cand, ref=ref)

    def scc(
        self, edges: DataFrame, nodes: DataFrame, rounds: int | None = None
    ) -> DataFrame:
        """(node, scc_id, scc_size) — strongly connected components of
        a BOUNDED directed (src, dst) graph by path-doubling closure +
        mutual reachability (operators/graph.py). For condensation /
        domain graphs (≤ thousands of nodes), not row-scale graphs.
        rounds=None forwards the operator default (graph._SCC_ROUNDS)."""
        from avro_parquet_spark_example_spark.operators.graph import (
            _SCC_ROUNDS,
            scc,
        )

        return scc(
            edges, nodes, rounds=_SCC_ROUNDS if rounds is None else rounds
        )

    def piecewise_trend(
        self,
        daily: DataFrame,
        key: str,
        order: str,
        value: str,
        segments: int = 3,
    ) -> DataFrame:
        """(key, segment, n_days, mean_level, slope) — rank-tercile
        piecewise OLS trend over a keyed ordered integer series
        (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            piecewise_trend,
        )

        return piecewise_trend(
            daily, key=key, order=order, value=value, segments=segments
        )

    def median_ci(
        self, df: DataFrame, group: str, value: str
    ) -> DataFrame:
        """(group, n, median, ci_lo, ci_hi) — median with a
        distribution-free 95% order-statistic CI per group over any
        integer-valued column (operators/aggregates.py)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            median_ci,
        )

        return median_ci(df, group=group, value=value)

    def auc_bootstrap_cell(self, scored: DataFrame) -> DataFrame:
        """(n_pos, n_neg, auc, ci_lo, ci_hi) — corpus-size-independent
        cell-sufficiency AUC bootstrap over a scored frame with integer
        score column ``v`` (bounded value grid) and 0/1 label ``pos``
        (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            auc_bootstrap_cell,
        )

        return auc_bootstrap_cell(scored)

    def mcnemar(self, paired: DataFrame) -> DataFrame:
        """(event_type, n, b, c, chi2, chi2_cc, rejected) — McNemar's
        paired test over a (event_type, ya, yb) 0/1 frame, one row per
        shared item (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            mcnemar_paired,
        )

        return mcnemar_paired(paired)

    def cochran_q(self, paired: DataFrame) -> DataFrame:
        """(event_type, n, ca, cb, cc, q_stat, rejected) — Cochran's Q
        over a (event_type, ya, yb, yc) 0/1 frame, k = 3 treatments
        (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            cochran_q,
        )

        return cochran_q(paired)

    def krippendorff_alpha(
        self, ratings: DataFrame, item: str, category: str, n_raters: int
    ) -> DataFrame:
        """(n_items, n_raters, d_o, d_e, alpha) — nominal Krippendorff
        agreement over a ratings frame with exactly n_raters rows per
        item (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            krippendorff_alpha,
        )

        return krippendorff_alpha(
            ratings, item=item, category=category, n_raters=n_raters
        )

    def auc_delong_se(self, scored: DataFrame) -> DataFrame:
        """(n_pos, n_neg, auc, se_delong, ci_lo, ci_hi) — DeLong
        analytic SE + 95% CI for ROC AUC over a (v integer score,
        pos 0/1) scored frame (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            auc_delong_se,
        )

        return auc_delong_se(scored)

    def brier_decomposition(self, scored: DataFrame) -> DataFrame:
        """(event_type, n, brier, reliability, resolution, uncertainty)
        — Murphy decomposition over a (event_type, q forecast in
        [0, 10000], o 0/1 outcome, bin bucket id) frame
        (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            brier_decomposition,
        )

        return brier_decomposition(scored)

    def g_test(self, e: DataFrame) -> DataFrame:
        """(event_type, n, g_stat, rejected) — likelihood-ratio G-test
        of 2x2 independence over a (event_type, wk 0/1, hi 0/1) frame
        (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            g_test,
        )

        return g_test(e)

    def rbo(self, t1: DataFrame, t2: DataFrame, k: int = 50) -> DataFrame:
        """(k, overlap_at_k, a_k, rbo_trunc, rbo_ext) — rank-biased
        overlap at p=0.9 between two rank frames (shared id column +
        r1 / r2 ranks, 1..k), k <= 50 (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            rbo_overlap,
        )

        return rbo_overlap(t1, t2, k=k)

    def cuped(self, per_user: DataFrame) -> DataFrame:
        """(n_users, theta, mean_y, var_y, var_y_adj,
        var_reduction_pct) — CUPED variance reduction over a per-unit
        frame with exact-integer pre-period covariate ``x`` and metric
        ``y`` (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            cuped,
        )

        return cuped(per_user)

    def mann_kendall(
        self, daily: DataFrame, key: str, order: str, value: str
    ) -> DataFrame:
        """(key, n_days, s_stat, var_s, z, trend) — tie-corrected
        Mann-Kendall trend test over a keyed ordered integer series on
        a bounded grid (operators/timeseries.py)."""
        from avro_parquet_spark_example_spark.operators.timeseries import (
            mann_kendall,
        )

        return mann_kendall(daily, key=key, order=order, value=value)

    def kendall_w(self, counts: DataFrame) -> DataFrame:
        """(n_items, n_judges, w, chi2, rejected) — tie-corrected
        Kendall's coefficient of concordance over a (judge, item, cnt)
        score frame; densifies to the complete judge x item block
        (operators/inference.py)."""
        from avro_parquet_spark_example_spark.operators.inference import (
            kendall_w,
        )

        return kendall_w(counts)

    def jonckheere_terpstra(
        self, base: DataFrame, n_groups: int = 7
    ) -> DataFrame:
        """(event_type, n, jt2, mean_jt, var_jt, z, rejected) —
        ordered-alternative trend test over a (event_type, g ordered
        group, v integer value) observation frame
        (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            jonckheere_terpstra,
        )

        return jonckheere_terpstra(base, n_groups=n_groups)

    def gk_gamma_tau(self, base: DataFrame) -> DataFrame:
        """(event_type, concordant, discordant, gamma, somers_dyx,
        tau_b) — ordinal association over a (event_type, x, y)
        observation frame (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            gk_gamma_tau,
        )

        return gk_gamma_tau(base)

    def mood_median(self, base: DataFrame) -> DataFrame:
        """(event_type, n_i, above, at_or_below, pooled_median, chi2,
        rejected) — Mood's k-group median test over a (event_type, q
        integer value) observation frame (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            mood_median,
        )

        return mood_median(base)

    def runs_test(self, daily: DataFrame) -> DataFrame:
        """(event_type, runs, n1, n2, mean_runs, z, rejected) —
        Wald–Wolfowitz randomness test over a keyed ordered integer
        series (event_type, day, tq) (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            runs_test,
        )

        return runs_test(daily)

    def cliff_delta(self, base: DataFrame) -> DataFrame:
        """(event_type, n_weekend, n_weekday, delta, magnitude) —
        ordinal dominance effect size over a (event_type, wk 0/1, v
        integer value) frame (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            cliff_delta,
        )

        return cliff_delta(base)

    def kappa_weighted(self, base: DataFrame) -> DataFrame:
        """(event_type, n, kappa_linear, kappa_quadratic) — weighted
        Cohen's kappa over a (event_type, ra, rb) ordinal rating-pair
        frame (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            kappa_weighted,
        )

        return kappa_weighted(base)

    def ks_two_sample(self, base: DataFrame) -> DataFrame:
        """(event_type, n_weekend, n_weekday, ks_d, ks_stat, rejected)
        — exact two-sample Kolmogorov–Smirnov distance over a
        (event_type, wk 0/1, v integer value) frame
        (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            ks_two_sample,
        )

        return ks_two_sample(base)

    def auc_partial(self, scored: DataFrame) -> DataFrame:
        """(n_pos, n_neg, pauc, pauc_mcclish) — partial AUC over FPR ∈
        [0, 0.1] with McClish standardization, over a scored frame with
        integer column v (bounded grid, higher = more positive) and 0/1
        column pos (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            auc_partial,
        )

        return auc_partial(scored)

    def brunner_munzel(self, base: DataFrame) -> DataFrame:
        """(event_type, n_weekend, n_weekday, p_hat, w_stat, rejected)
        — nonparametric Behrens–Fisher test over a (event_type, wk 0/1,
        v integer value) frame (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            brunner_munzel,
        )

        return brunner_munzel(base)

    def kaplan_meier(self, subj: DataFrame) -> DataFrame:
        """(grp, t, n_risk, n_event, n_censor, survival) — Kaplan–Meier
        estimator over a (user_id, grp cohort, t integer duration, ev
        0/1 observed flag) subject frame (operators/survival.py)."""
        from avro_parquet_spark_example_spark.operators.survival import (
            kaplan_meier,
        )

        return kaplan_meier(subj)

    def lorenz_curve(self, per_user: DataFrame) -> DataFrame:
        """(event_type, decile, n_users, cum_user_share,
        cum_value_share) — Lorenz curve decile points over a
        (event_type, user_id, s integer total) per-unit frame
        (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            lorenz_curve,
        )

        return lorenz_curve(per_user)

    def equidepth_histogram_bucketed(
        self, e: DataFrame, tiles: int = 8, n_buckets: int = 64
    ) -> DataFrame:
        """(event_type, bucket, n, lo, hi) — per-type equi-depth NTILE
        histogram via the partitioned two-phase bucketed rank — no
        per-type full-population sort (operators/aggregates.py)."""
        from avro_parquet_spark_example_spark.operators.aggregates import (
            equidepth_histogram_bucketed,
        )

        return equidepth_histogram_bucketed(
            e, tiles=tiles, n_buckets=n_buckets
        )

    def nelson_aalen(self, subj: DataFrame) -> DataFrame:
        """(grp, t, n_risk, n_event, n_censor, cum_hazard, var_hazard)
        — Nelson–Aalen cumulative hazard over a (user_id, grp, t, ev)
        subject frame (operators/survival.py)."""
        from avro_parquet_spark_example_spark.operators.survival import (
            nelson_aalen,
        )

        return nelson_aalen(subj)

    def rmst(self, subj: DataFrame, tau: int = 30) -> DataFrame:
        """(grp, tau, rmst) — restricted mean survival time at horizon
        ``tau`` over a (user_id, grp, t, ev) subject frame
        (operators/survival.py)."""
        from avro_parquet_spark_example_spark.operators.survival import (
            rmst,
        )

        return rmst(subj, tau=tau)

    def cvm_two_sample(self, base: DataFrame) -> DataFrame:
        """(event_type, n_weekend, n_weekday, cvm_t, rejected) —
        Cramér–von Mises two-sample criterion over a (event_type, wk
        0/1, v integer) frame (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            cvm_two_sample,
        )

        return cvm_two_sample(base)

    def cochran_armitage(self, base: DataFrame) -> DataFrame:
        """(event_type, n, r, n_groups, z, rejected) — Cochran–Armitage
        trend test over a (event_type, s integer score, y 0/1) frame
        (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            cochran_armitage,
        )

        return cochran_armitage(base)

    def hosmer_lemeshow(self, scored: DataFrame) -> DataFrame:
        """(n, n_groups, hl_chi2, rejected) — Hosmer–Lemeshow
        calibration test over a (v integer score, pos 0/1) frame
        (operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            hosmer_lemeshow,
        )

        return hosmer_lemeshow(scored)

    def lorenz_curve_bucketed(
        self, per_user: DataFrame, n_buckets: int = 64
    ) -> DataFrame:
        """:meth:`lorenz_curve` with the per-type rank computed by the
        partitioned two-phase bucketed prefix sum — bit-identical
        output, no per-type full-population sort (the 100 TB form;
        operators/rankstats.py)."""
        from avro_parquet_spark_example_spark.operators.rankstats import (
            lorenz_curve_bucketed,
        )

        return lorenz_curve_bucketed(per_user, n_buckets=n_buckets)
