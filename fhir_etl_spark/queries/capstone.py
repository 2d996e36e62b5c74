"""c5 — the capstone web-curation pipeline (VERDICT r10 #1): the full
production recipe "curate a crawl into training shards" as ONE plan and
ONE value oracle.

Stages, in the order a Common Crawl curation run executes them:

1. **WARC ingestion** (s12): each document is decorated into a full
   HTML page and exported into member-per-record-gzip WARC files, then
   read back through the ``warc_archive`` Python DataSource — the real
   container grammar, one partition per file. (The oracle starts from
   ``documents`` + the decoration SQL: s12's own oracle proves the WARC
   round trip is byte-exact, so replaying it again would only re-test
   the container.)
2. **HTML main-content extraction** (t24): strip script/style/comments,
   split on block tags, keep blocks with ≥5 visible words and ≤30%
   anchor share. The c5 page plants two boilerplate paragraphs that
   PASS this gate — a cookie banner identical on every page and a
   per-source syndication tag — because that is precisely what HTML
   extraction cannot remove and the next stage exists for.
3. **Line-level dedup** (t26): lines appearing in ≥2 distinct documents
   are dropped everywhere (the cookie/syndication lines, plus any
   exact-duplicate content lines), documents reassembled in order.
4. **Fuzzy dedup** (c4's recipe): exact 3-gram Jaccard pairs ≥ 0.5 over
   the CLEANED text → connected components → keep the highest-quality
   member per cluster (t2 score, id tie-break) + all singletons.
5. **Decontamination** (d11): survivors sharing any 3-gram shingle with
   the benchmark slice (doc_id % 97 == 0) are dropped, as is the
   benchmark slice itself. Bloom-prefiltered map-side, exact verify.
6. **Quality gate** (t2, the c2 gate): integer-exact heuristic quality
   ≥ 0.5 and ≥ 10 tokens over the cleaned text. (The frozen t22 head is
   deliberately NOT the gate: it collapses to always-negative on the
   shared-vocabulary synthetic corpus — see functions/ft_weights.py —
   and would silently empty the pipeline at every SF.)
7. **Sequence packing** (ds5): first-fit into 2048-token sequences, 8
   packing shards (per-shard deterministic hash order).
8. **Shard shuffle** (ds4): the packed SEQUENCES are reshuffled into 8
   ordered output shards — the trainer's reproducible global shuffle.

Output: one row per surviving document —
``(doc_id, n_tokens, pack_shard, seq_id, seq_offset, out_shard,
seq_pos)``.

The oracle replays every stage as one DuckDB CTE chain (the nested
WITH-RECURSIVE pattern d6/ds5 already use), so a regression ANYWHERE in
the chain — a block mis-kept, a boilerplate line surviving, a wrong
cluster winner, a missed contamination hit, a mis-scored gram, a packing
off-by-one, a shard misplacement — value-mismatches even while every
unit query stays green (the c2 lesson: composition is where
cross-operator bugs live).

Scale shape (the 100 TB argument, stage by stage): WARC scan is one
partition per archive file; extraction + scoring are map-only codegen;
line dedup is three digest/id-keyed exchanges with raw text shuffled
once; pair mining is inverted-index (posting-list) shaped, never
all-pairs; CC touches only matched docs; decontamination broadcasts a
Bloom bitset and verifies only survivors; the classifier is a literal
in the plan; packing is one hash exchange + per-shard linear state;
the final shuffle is one hash exchange over SEQUENCES (≪ docs). No
stage collects the corpus to the driver.

Reference kin: the three-stage CLI lifecycle composed end to end
(reference ``cli.py:17-65`` — fhirize → link → validate as one run);
the curation semantics follow Penedo 2023 (RefinedWeb), Wenzek 2020
(CCNet), Raffel 2020 (C4), Joulin 2016 (fastText), Brown 2020 (GPT-3
benchmark decontamination).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.queries.text import _T24_PIECES, _TOKS_SQL, t24_extract_sql
from fhir_etl_spark.session import load_tables

# --- the c5 page decoration ----------------------------------------------
# t24's page with two planted boilerplate paragraphs that SURVIVE
# extraction (≥5 visible words, zero anchors) so the line-dedup stage has
# real work: a cookie banner shared by every page, and a per-source
# syndication tag shared within each source group.
_C5_COOKIE = "please accept cookies to continue reading this page"
_C5_TAG_PRE = "content provided by partner network "
_C5_TAG_POST = " syndication desk"

_C5_PIECES: tuple[tuple[str, str | None], ...] = (
    _T24_PIECES[:8]
    + (
        ("lit", f"</h1><p>{_C5_COOKIE}</p><p>{_C5_TAG_PRE}"),
        ("source", None),
        ("lit", f"{_C5_TAG_POST}</p><p>"),
    )
    + _T24_PIECES[9:]
)


def _c5_page_col() -> F.Column:
    parts = []
    for kind, val in _C5_PIECES:
        if kind == "lit":
            parts.append(F.lit(val))
        elif kind == "id":
            parts.append(F.col("doc_id").cast("string"))
        elif kind == "source":
            parts.append(F.col("source"))
        else:
            parts.append(F.replace(F.col("text"), F.lit(". "), F.lit(".</p><p>")))
    return F.concat(*parts)


def _c5_page_sql() -> str:
    parts = []
    for kind, val in _C5_PIECES:
        if kind == "lit":
            parts.append("'" + val + "'")
        elif kind == "id":
            parts.append("CAST(doc_id AS VARCHAR)")
        elif kind == "source":
            parts.append("source")
        else:
            parts.append("replace(text, '. ', '.</p><p>')")
    return " || ".join(parts)


# --- WARC staging (the s12 export shape, html payloads) -------------------
# Floor on the export file count; the actual count scales with the
# session's parallelism (r12 session 6, guide §2.2/§6): the warc_archive
# DataSource reads ONE PARTITION PER FILE, so a pinned 8 serialized the
# extract stage — the capstone's single most expensive map work — onto 8
# of 32 cores (measured: the 8-task WARC→extract stage ran 111 s of
# executor time per job at sf10-shape). doc_id % n_files only changes
# which export file a page lands in, never a row value — doc_id is
# recovered from the record URI, and the oracle replays from
# ``documents`` directly.
_C5_N_WARC_FILES = 8


def _c5_warc_file_count(spark: SparkSession) -> int:
    return max(_C5_N_WARC_FILES, spark.sparkContext.defaultParallelism)


def _stage_and_scan_warc(
    spark: SparkSession, sf_dir: str, pages: DataFrame
) -> DataFrame:
    """Export the decorated pages into member-per-record-gzip WARC files
    (one file per task — the crawl-dump export shape) and read them back
    through the warc_archive DataSource → ``(doc_id, html)``. doc_id is
    recovered from the record's target URI, the way a real crawl keys
    pages by URL."""
    from fhir_etl_spark.sources.warc import WarcDataSource

    out_dir = "/tmp/fhir_etl_spark_warc_c5/" + os.path.basename(
        sf_dir.rstrip("/")
    )
    os.makedirs(out_dir, exist_ok=True)

    def write_group(key, pdf):
        import pandas as pd

        from fhir_etl_spark.sources.warc import http_response_record, write_warc

        fid = int(key[0])
        records = [
            http_response_record(
                f"http://corpus.local/{int(doc_id)}",
                str(html).encode("utf-8"),
                record_id=f"doc-{int(doc_id)}",
            )
            for doc_id, html in sorted(
                zip(pdf["doc_id"], pdf["html"]), key=lambda t: t[0]
            )
        ]
        path = f"{out_dir}/part-{fid:04d}.warc.gz"
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(write_warc(records, gzip_members=True))
        os.replace(tmp, path)
        return pd.DataFrame({"file_id": [fid], "n": [len(pdf)]})

    n_files = _c5_warc_file_count(spark)
    written = (
        pages.withColumn("file_id", F.col("doc_id") % n_files)
        .groupBy("file_id")
        .applyInPandas(write_group, "file_id long, n long")
        .collect()
    )

    try:
        spark.dataSource.register(WarcDataSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass
    # Read back ONLY the files this run wrote (ADVICE r12): n_files
    # scales with defaultParallelism while out_dir persists in /tmp, so
    # a residue that is empty in THIS run must not pick up a stale
    # part file from a prior run with a different core count (duplicate
    # doc_ids), and a missing file must not become a silently-dropped
    # error row. The write_group output is the authoritative manifest.
    paths = ",".join(
        f"{out_dir}/part-{int(r['file_id']):04d}.warc.gz"
        for r in sorted(written, key=lambda r: r["file_id"])
    )
    scanned = spark.read.format("warc_archive").option("paths", paths).load()
    return scanned.where(F.col("warc_type") == "response").select(
        F.regexp_extract(F.col("target_uri"), r"(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("payload").alias("html"),
    )


# --- the oracle -----------------------------------------------------------
_NORM_LINE = "md5(lower(trim(regexp_replace({src}, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))))"
_STOPWORDS = "['the','a','of','and','to','in','is','that','for','it']"


def _c5_oracle(gate_cte: str | None = None) -> str:
    """The capstone CTE chain. ``gate_cte`` overrides the quality-gate
    CTE group (everything between the ``decon`` CTE and ``packed``) —
    c5b swaps the raw t2 threshold for the learned t22q head here while
    every other stage replays unchanged."""
    extract = t24_extract_sql(
        f"SELECT doc_id, {_c5_page_sql()} AS html FROM documents"
    )
    if gate_cte is None:
        gate_cte = f"""gate AS MATERIALIZED (
      SELECT q.doc_id FROM q
      JOIN decon USING (doc_id)
      JOIN (SELECT doc_id, len({_TOKS_SQL}) AS n_words FROM cleaned) nw
        ON nw.doc_id = q.doc_id
      WHERE q.quality >= 0.5 AND nw.n_words >= 10
    )"""
    return f"""
    WITH extracted AS MATERIALIZED ({extract}),
    ln AS (
      SELECT doc_id, i AS pos, ls[i] AS line,
             {_NORM_LINE.format(src="ls[i]")} AS d
      FROM (SELECT doc_id, string_split(main_text, chr(10)) AS ls
            FROM extracted),
           unnest(generate_series(1, len(ls))) AS g(i)
    ), dup AS (
      SELECT d FROM ln GROUP BY d HAVING count(DISTINCT doc_id) >= 2
    ), cleaned AS MATERIALIZED (
      SELECT e.doc_id, coalesce(a.text, '') AS text
      FROM extracted e LEFT JOIN (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        FROM ln ANTI JOIN dup USING (d)
        GROUP BY doc_id
      ) a USING (doc_id)
    ), q AS MATERIALIZED (
      SELECT doc_id,
             (4*least(n_tok, 100)*nc*nt
            + 300*(nc - least(5*n_punct, nc))*nt
            + 300*least(5*n_stop, nt)*nc) / (1000*nc*nt) AS quality
      FROM (
        SELECT doc_id, n_tok, n_punct, n_stop,
               greatest(n_chars, 1) AS nc, greatest(n_tok, 1) AS nt
        FROM (
          SELECT doc_id,
                 len({_TOKS_SQL}) AS n_tok,
                 length(text) AS n_chars,
                 len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS n_punct,
                 len(list_filter({_TOKS_SQL},
                      x -> list_contains({_STOPWORDS}, x))) AS n_stop
          FROM cleaned
        )
      )
    ), pairs AS (
      WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS t FROM cleaned
      ), sh AS (
        SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS shingle
        FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
        WHERE len(t) >= 3
      ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT a, b FROM inter
        JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
      WHERE round(inter / (sa.n + sb.n - inter), 4) >= 0.5
    ), edges AS (
      SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs
    ), reach AS (
      WITH RECURSIVE r(node, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.label FROM edges e JOIN r ON e.dst = r.node
      ) SELECT * FROM r
    ), clusters AS MATERIALIZED (
      SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
    ), winners AS (
      SELECT doc_id FROM (
        SELECT c.doc_id,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY m.quality DESC, c.doc_id) AS rn
        FROM clusters c JOIN q m ON m.doc_id = c.doc_id
      ) WHERE rn = 1
    ), survivors AS MATERIALIZED (
      SELECT doc_id FROM winners
      UNION ALL
      SELECT q.doc_id FROM q ANTI JOIN clusters USING (doc_id)
    ), shingles AS MATERIALIZED (
      SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS shingle
      FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM cleaned),
           unnest(generate_series(1, len(t) - 2)) AS g(i)
      WHERE len(t) >= 3
    ), cont AS (
      SELECT DISTINCT c.doc_id
      FROM (SELECT s.* FROM shingles s JOIN survivors USING (doc_id)
            WHERE s.doc_id % 97 <> 0) c
      JOIN (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 97 = 0) b
        ON c.shingle = b.shingle
    ), decon AS (
      SELECT doc_id FROM survivors
      WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)
    ), {gate_cte}, packed AS MATERIALIZED (
      WITH RECURSIVE pb AS (
        SELECT doc_id, shard, n_tokens,
               row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS rn
        FROM (
          SELECT cd.doc_id,
                 CAST(CAST('0x' || substr(md5('pack' || CAST(cd.doc_id AS VARCHAR)), 1, 8) AS UBIGINT)
                      % 1000000 % 8 AS INTEGER) AS shard,
                 CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
                 md5('pack:ord' || CAST(cd.doc_id AS VARCHAR)) AS ord
          FROM (SELECT doc_id, text FROM cleaned) cd
          JOIN gate USING (doc_id)
        )
      ), walk AS (
        SELECT shard, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS seq_cur,
               CAST(0 AS BIGINT) AS off,
               CAST(CASE WHEN n_tokens >= 2048 THEN 1 ELSE 0 END AS BIGINT) AS seq_after,
               CAST(CASE WHEN n_tokens >= 2048 THEN 0 ELSE n_tokens END AS BIGINT) AS used_after
        FROM pb WHERE rn = 1
        UNION ALL
        SELECT b.shard, b.rn, b.doc_id, b.n_tokens,
               CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                    THEN w.seq_after + 1 ELSE w.seq_after END,
               CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                    THEN 0 ELSE w.used_after END,
               (CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                     THEN w.seq_after + 1 ELSE w.seq_after END)
               + CASE WHEN (CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                                 THEN 0 ELSE w.used_after END) + b.n_tokens >= 2048
                      THEN 1 ELSE 0 END,
               CASE WHEN (CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                               THEN 0 ELSE w.used_after END) + b.n_tokens >= 2048
                    THEN 0
                    ELSE (CASE WHEN w.used_after > 0 AND w.used_after + b.n_tokens > 2048
                               THEN 0 ELSE w.used_after END) + b.n_tokens END
        FROM walk w JOIN pb b ON b.shard = w.shard AND b.rn = w.rn + 1
      )
      SELECT doc_id, CAST(shard AS INT) AS pack_shard,
             CAST(shard * 1099511627776 + seq_cur AS BIGINT) AS seq_id,
             off AS seq_offset, n_tokens
      FROM walk
    ), sseq AS (
      SELECT seq_id,
             CAST(CAST('0x' || substr(md5('shuffle' || CAST(seq_id AS VARCHAR)), 1, 8) AS UBIGINT)
                  % 1000000 % 8 AS INT) AS out_shard,
             md5('shuffle:pos' || CAST(seq_id AS VARCHAR)) AS ord
      FROM (SELECT DISTINCT seq_id FROM packed)
    ), placed AS (
      SELECT seq_id, out_shard,
             CAST(row_number() OVER (PARTITION BY out_shard ORDER BY ord, seq_id)
                  AS INT) AS seq_pos
      FROM sseq
    )
    SELECT p.doc_id, p.n_tokens, p.pack_shard, p.seq_id, p.seq_offset,
           pl.out_shard, pl.seq_pos
    FROM packed p JOIN placed pl USING (seq_id)
    """


def _c5_pipeline(
    spark: SparkSession, sf_dir: str, learned_gate: bool
) -> DataFrame:
    """Shared capstone body; ``learned_gate`` swaps stage 6 between the
    raw t2 threshold (c5) and the trained t22q head (c5b)."""
    from fhir_etl_spark.operators.contamination import bloom_decontaminate
    from fhir_etl_spark.operators.dedup import (
        dedup_clusters,
        line_dedup,
        ngram_jaccard_pairs,
    )
    from fhir_etl_spark.operators.datasets import shard_shuffle
    from fhir_etl_spark.operators.html import extract_main_content
    from fhir_etl_spark.operators.packing import pack_sequences
    from fhir_etl_spark.operators.text import quality_score, token_count
    from pyspark.sql import Window

    documents = load_tables(spark, sf_dir, "documents")

    # 1. WARC export + DataSource read-back
    pages = documents.select("doc_id", _c5_page_col().alias("html"))
    crawled = _stage_and_scan_warc(spark, sf_dir, pages)

    # 2. HTML main-content extraction. persist(): the r12 line-dedup
    # tail consumes its input three ways (digest counts, the drop-list
    # semi join, and the map-side rebuild's own text pass) — without a
    # barrier each consumer re-runs the WARC-scan → extract prefix,
    # the single most expensive map work in the recipe (the same
    # 4-consumer argument as `cleaned` below; a deployment would have
    # the extracted corpus on disk at this boundary anyway).
    ex = extract_main_content(
        crawled, html_col="html", min_words=5, link_pct=30
    ).persist()
    # Materialize the barrier NOW (one bounded count action). persist()
    # alone is lazy, and the consumers below include BROADCAST subtrees
    # whose exchange builds run as concurrent driver futures — concurrent
    # first-touch jobs on an unpopulated cache do NOT share work, so the
    # WARC→extract prefix executed once PER RACING JOB (r12 session 6,
    # sf10-shape: three identical 8-task extract stages at the same
    # submit second, 111 s of executor time each). One eager count
    # populates the cache before any fan-out; every later consumer reads
    # InMemoryTableScan. Same rows, same plan below the barrier.
    ex.count()

    # 3. cross-document line dedup over the extracted prose. The barrier
    # is load-bearing: `cleaned` feeds FOUR consumers (keeper quality,
    # pair mining, the decontamination corpus AND benchmark) and without
    # it each one re-executes the WARC-scan → extract → line-dedup
    # prefix (measured 173 s → 33 s at sf0.1 from the three barriers in
    # this function; a deployment would persist the cleaned corpus
    # anyway). persist(), NOT localCheckpoint: under AQE, checkpoint's
    # toRdd conversion executes the upstream shuffle stages EAGERLY at
    # plan-build time and the uncached RDD then re-executes them —
    # swapping the three barriers to persist() cut c5 331 → 245 s at
    # sf10-shape (the r12 v14 lesson, fhir_etl_spark/operators/
    # similarity.py hashed_embedding).
    cleaned = (
        line_dedup(
            ex.select("doc_id", F.col("main_text").alias("text")),
            min_doc_freq=2,
        )
        .select("doc_id", F.col("clean_text").alias("text"))
        .persist()
    )
    cleaned.count()  # populate before the 4-way fan-out (see ex.count())

    # 4. fuzzy dedup: pairs → components → best-quality keeper + singletons
    quality = cleaned.select(
        "doc_id", quality_score("text").alias("quality")
    )
    # posting-list exact miner, NOT the r12 prefix-filtered variant:
    # A/B at sf10-shape (cold, identical protocol) measured the prefix
    # route 4.3× slower on c4 (189 vs 43.6 s) and +73% on c5 (245 vs
    # 141 s with persist barriers) with 5.5× the shuffle bytes — the
    # df-ordering prefix needs two extra corpus-linear exchanges of the
    # shingle stream (dfreq join + per-doc prefix cut), and at this
    # corpus's duplicate density the quadratic pair term it removes is
    # NOT byte-dominant. ngram_jaccard_pairs_prefix stays registered
    # (d3p, value-oracled) as the exactness-preserving path for corpora
    # whose hot shingles would otherwise hit the DF cap. SCALE.md r12.
    clusters = dedup_clusters(
        ngram_jaccard_pairs(cleaned, threshold=0.5)
    ).persist()
    clusters.count()  # two consumers + broadcast builds (see ex.count())
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    winners = (
        clusters.join(quality, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id")
    )
    singletons = quality.join(
        clusters.select("doc_id"), "doc_id", "left_anti"
    ).select("doc_id")
    survivors = winners.unionByName(singletons)

    # 5. benchmark decontamination over the cleaned text
    surv_docs = cleaned.join(survivors, "doc_id")
    corpus = surv_docs.filter(F.col("doc_id") % 97 != 0)
    benchmark = cleaned.filter(F.col("doc_id") % 97 == 0)
    decon = bloom_decontaminate(corpus, benchmark, k=3)

    # 6. quality gate over the cleaned text. Default (c5): the c2 gate
    # (t2 integer-exact score ≥ 0.5 AND ≥ 10 tokens) — NOT the frozen
    # t22 lang head, which collapses to always-negative on this
    # shared-vocabulary synthetic corpus (see functions/ft_weights.py).
    # Learned (c5b): the t22q head trained on the t2 gate itself
    # (tools/train_t22q.py, 0.948 train vs 0.818 majority) — the
    # GPT-3-recipe shape where a classifier generalizes the heuristic;
    # the ≥10-token floor stays (a packer needs non-trivial sequences).
    if learned_gate:
        from fhir_etl_spark.functions import ft_weights_q as fq
        from fhir_etl_spark.operators.classifier import quality_gate_scores

        keep_ids = (
            quality_gate_scores(
                cleaned, fq.W_MICRO, fq.BIAS_MICRO, fq.SALT,
                meta_repeat=fq.META_REPEAT,
            )
            .where(F.col("score_micro") > 0)
            .select("doc_id")
        )
    else:
        keep_ids = quality.where(F.col("quality") >= 0.5).select("doc_id")
    kept = decon.join(keep_ids, "doc_id").where(
        token_count(F.col("text")) >= 10
    )

    # 7. pack into 2048-token sequences (8 packing shards)
    with_counts = kept.withColumn("n_tokens", token_count(F.col("text")))
    packed = pack_sequences(
        with_counts, "n_tokens", budget=2048, n_shards=8
    ).persist()
    packed.count()  # seqs branch + final join both read it (see ex.count())

    # 8. reproducible shuffle of the SEQUENCES into 8 output shards
    seqs = packed.select("seq_id").distinct()
    placed = shard_shuffle(seqs, "seq_id", n_shards=8).select(
        "seq_id",
        F.col("shard").alias("out_shard"),
        F.col("pos").alias("seq_pos"),
    )
    return packed.join(placed, "seq_id").select(
        "doc_id",
        "n_tokens",
        F.col("shard").alias("pack_shard"),
        "seq_id",
        "seq_offset",
        "out_shard",
        "seq_pos",
    )


@query(
    "c5_capstone_curation",
    oracle=_c5_oracle(),
    tags=("pipeline", "warc", "html", "dedup", "training", "capstone"),
)
def c5_capstone_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone: WARC → extract → line dedup → fuzzy dedup →
    decontaminate → quality gate → pack → shard, as ONE plan (module
    docstring has the full stage map and the 100 TB shape argument)."""
    return _c5_pipeline(spark, sf_dir, learned_gate=False)


def _c5b_gate_cte() -> str:
    from fhir_etl_spark.queries.text import _t22q_score_sql

    scored = _t22q_score_sql("SELECT doc_id, text FROM cleaned")
    return f"""scoreq AS MATERIALIZED ({scored}), gate AS MATERIALIZED (
      SELECT s.doc_id FROM scoreq s
      JOIN decon USING (doc_id)
      JOIN (SELECT doc_id, len({_TOKS_SQL}) AS n_words FROM cleaned) nw
        ON nw.doc_id = s.doc_id
      WHERE s.score_micro > 0 AND nw.n_words >= 10
    )"""


@query(
    "c5b_capstone_learned_gate",
    oracle=_c5_oracle(gate_cte=_c5b_gate_cte()),
    tags=("pipeline", "warc", "html", "dedup", "training", "capstone", "classifier"),
)
def c5b_capstone_learned_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c5 with the LEARNED quality gate (VERDICT r11 #5): stage 6
    filters on the trained t22q head's sign (a classifier trained to
    generalize the t2 heuristic — the GPT-3 curation recipe, where the
    quality filter is a model, not a formula) instead of the raw
    threshold. Every other stage — WARC staging, extraction, line
    dedup, posting-list fuzzy dedup, decontamination, packing,
    sharding — replays identically, and the ONE CTE-chain oracle swaps
    only the gate group, so a drift in the learned featurization (a
    meta-token bin, a hash bucket, the repeat count) value-mismatches
    the final packed shards."""
    return _c5_pipeline(spark, sf_dir, learned_gate=True)


# --- c6: the RAG retrieval pipeline ----------------------------------------
def _c6_oracle(pool: int = 5, budget: int = 128) -> str:
    from fhir_etl_spark.queries.text import (
        _T14_ORACLE,
        _T23_Q_SQL,
        _bm25_oracle_sql,
    )

    ranked = _bm25_oracle_sql(_T23_Q_SQL, pool, corpus="chunk_docs")
    return f"""
    WITH chunks AS MATERIALIZED (
      SELECT doc_id * 100000 + chunk_index AS cid, n_chunk_tokens, chunk_text
      FROM ({_T14_ORACLE})
    ), chunk_docs AS (
      SELECT cid AS doc_id, chunk_text AS text FROM chunks
    ), ranked AS MATERIALIZED (
      {ranked}
    ), hits AS (
      SELECT r.query_id, r.rank, c.n_chunk_tokens, c.chunk_text
      FROM ranked r JOIN chunks c ON r.doc_id = c.cid
    ), kept AS (
      SELECT * FROM (
        SELECT hits.*,
               sum(n_chunk_tokens) OVER (
                 PARTITION BY query_id ORDER BY rank
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM hits
      ) WHERE cum_tokens <= {budget}
    )
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_chunk_tokens) AS BIGINT) AS context_tokens,
           array_to_string(list(chunk_text ORDER BY rank), ' ') AS context_text
    FROM kept GROUP BY query_id
    """


_CHUNK_PACK_BASE = 100000


def _pack_chunk_id(doc_id, chunk_index):
    """cid = doc_id·100000 + chunk_index — PLAIN arithmetic. The
    100k-chunks/doc contract is enforced by :func:`_chunk_index_guard`
    as ONE filter predicate, NOT inside this expression: embedding the
    raise_error branch in cid let InferFiltersFromJoinKeys + pushdown
    duplicate the guarded CASE into 11 plan sites (every isnotnull(cid)
    inference and join-key projection) — measured 2× on c6 at
    sf10-shape (59 vs 28 s). Keep cid trivially inlinable; guard once."""
    return (doc_id * _CHUNK_PACK_BASE + chunk_index).cast("long")


def _chunk_index_guard(chunk_index):
    """Filter predicate enforcing the cid-packing contract loudly: true
    for every legal row, raise_error (never silently-aliased cids) for
    chunk_index ≥ 100000 — same pattern as token_budget_mix's
    zero-token guard, applied ONCE per chunk row at the chunk source."""
    return F.when(chunk_index < _CHUNK_PACK_BASE, F.lit(True)).otherwise(
        F.raise_error(F.format_string(
            "c6_rag_pipeline: chunk_index %s >= 100000 — cid packing "
            "(doc_id*100000 + chunk_index) would collide; re-chunk with "
            "larger windows or widen the packing base", chunk_index,
        )).cast("boolean")
    )


@query(
    "c6_rag_pipeline",
    oracle=_c6_oracle(),
    tags=("capstone", "retrieval", "text", "chunking"),
)
def c6_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval-side composed pipeline (the c-tier's answer for
    SERVING the curated corpus, where c1–c5 build it): chunk every
    document into 64-token / 16-overlap windows (t14), build the BM25
    inverted index over the CHUNKS (t23's operator on a derived corpus),
    retrieve the top-5 chunks per query, then assemble each query's
    context greedily in rank order under a 128-token budget — the exact
    shape of a production RAG context builder.

    One value oracle replays the whole chain (chunk arithmetic → BM25
    integer-micro scoring over chunks → running-sum budget cut →
    ordered context concat), so a drift anywhere — a chunk boundary, a
    tf over the wrong corpus, an off-by-one in the budget window —
    mismatches the assembled context string itself.

    Scale shape: chunking is map-only (no explode of the token stream —
    the chunk windows slice one tokens array); the index is t23's two
    key-partial groupBys over chunks; query terms broadcast into the
    postings scan; everything after the rank trim operates on
    |queries|·pool rows. Chunk ids pack as doc_id·100000 + index —
    collision-free to 100k chunks/doc, BIGINT-safe to ~9e13 docs; the
    100k-chunks/doc contract is enforced at runtime with raise_error
    (a violating doc fails the job loudly instead of aliasing cids)."""
    from pyspark.sql import Window

    from fhir_etl_spark.operators.retrieval import bm25_index, bm25_topk
    from fhir_etl_spark.operators.text import chunk_documents
    from fhir_etl_spark.queries.text import _T23_QUERIES

    pool, budget = 5, 128
    documents = load_tables(spark, sf_dir, "documents")
    chunks = (
        chunk_documents(documents, chunk_tokens=64, overlap=16)
        .where(_chunk_index_guard(F.col("chunk_index")))
        .select(
            _pack_chunk_id(F.col("doc_id"), F.col("chunk_index")).alias("cid"),
            "n_chunk_tokens",
            "chunk_text",
        )
    )
    postings, dfreq, stats = bm25_index(
        chunks.select(F.col("cid").alias("doc_id"), F.col("chunk_text").alias("text"))
    )
    queries = spark.createDataFrame(
        list(_T23_QUERIES), "query_id int, query string"
    )
    ranked = bm25_topk(postings, dfreq, stats, queries, k=pool)
    hits = chunks.join(
        F.broadcast(ranked), chunks["cid"] == ranked["doc_id"]
    ).select("query_id", "rank", "n_chunk_tokens", "chunk_text")
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = hits.withColumn(
        "cum_tokens", F.sum("n_chunk_tokens").over(w)
    ).filter(F.col("cum_tokens") <= budget)
    return kept.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("n_chunk_tokens").cast("long").alias("context_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "chunk_text"))),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("context_text"),
    )
