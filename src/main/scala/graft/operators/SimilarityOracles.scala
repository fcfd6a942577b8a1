package graft.operators

/** DuckDB oracle SQL for the ANN/similarity family (s01–s16) — the
  * family-file split of `Similarity.scala` under the repo's 1,500-line
  * discipline (the RowCatalogOracles pattern): query keys and SQL
  * strings moved byte-identically; [[Similarity.oracles]] aggregates.
  */
object SimilarityOracles {

  val oracles: Map[String, String] = Map(
    // the four greedy rounds unrolled as CTEs (BPE-trainer
    // discipline), identical double arithmetic and (mmr DESC, n_id)
    // tie-break
    "s13_mmr_diversify" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT v FROM e WHERE vec_id = 0),
        |cand AS (SELECT c.vec_id AS n_id, c.v,
        |    list_cosine_similarity(q.v, c.v) AS rel
        |  FROM e c, q WHERE c.vec_id <> 0
        |  ORDER BY rel DESC, n_id ASC LIMIT 12),
        |s1 AS (SELECT n_id, v, rel * 0.7 AS mmr FROM cand
        |  ORDER BY rel DESC, n_id ASC LIMIT 1),
        |sel1 AS (SELECT n_id, v FROM s1),
        |r2 AS (SELECT c.n_id, c.v,
        |    c.rel * 0.7 - MAX(list_cosine_similarity(c.v, s.v)) * 0.3 AS mmr
        |  FROM cand c, sel1 s WHERE c.n_id NOT IN (SELECT n_id FROM sel1)
        |  GROUP BY c.n_id, c.v, c.rel),
        |s2 AS (SELECT n_id, v, mmr FROM r2 ORDER BY mmr DESC, n_id ASC LIMIT 1),
        |sel2 AS (SELECT n_id, v FROM sel1 UNION ALL SELECT n_id, v FROM s2),
        |r3 AS (SELECT c.n_id, c.v,
        |    c.rel * 0.7 - MAX(list_cosine_similarity(c.v, s.v)) * 0.3 AS mmr
        |  FROM cand c, sel2 s WHERE c.n_id NOT IN (SELECT n_id FROM sel2)
        |  GROUP BY c.n_id, c.v, c.rel),
        |s3 AS (SELECT n_id, v, mmr FROM r3 ORDER BY mmr DESC, n_id ASC LIMIT 1),
        |sel3 AS (SELECT n_id, v FROM sel2 UNION ALL SELECT n_id, v FROM s3),
        |r4 AS (SELECT c.n_id, c.v,
        |    c.rel * 0.7 - MAX(list_cosine_similarity(c.v, s.v)) * 0.3 AS mmr
        |  FROM cand c, sel3 s WHERE c.n_id NOT IN (SELECT n_id FROM sel3)
        |  GROUP BY c.n_id, c.v, c.rel),
        |s4 AS (SELECT n_id, v, mmr FROM r4 ORDER BY mmr DESC, n_id ASC LIMIT 1)
        |SELECT pick, n_id, round(mmr, 6) + 0.0 AS mmr FROM (
        |  SELECT 1 AS pick, n_id, mmr FROM s1
        |  UNION ALL SELECT 2, n_id, mmr FROM s2
        |  UNION ALL SELECT 3, n_id, mmr FROM s3
        |  UNION ALL SELECT 4, n_id, mmr FROM s4)
        |ORDER BY pick""".stripMargin,

    // the radius membership restated with the same unrounded-threshold
    // compare as d05 (proven cross-engine); output rounds for display
    "s18_ann_range_search" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |  round(list_cosine_similarity(q.v, c.v), 6) + 0.0 AS cos
        |FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
        |WHERE list_cosine_similarity(q.v, c.v) >= 0.25
        |ORDER BY q_id, n_id""".stripMargin,

    // the exact member count at the s18 radius; the recall and
    // zero-false-positive pins are TRUE by the probe's contract
    "s19_ann_range_ivf" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT COUNT(*) AS n_pairs, TRUE AS range_ivf_recall_ok,
        |  TRUE AS zero_false_pos
        |FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
        |WHERE list_cosine_similarity(q.v, c.v) >= 0.25""".stripMargin,

    "s01_ann_bruteforce" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id)
        |SELECT q_id, n_id, rank, round(cos, 6) + 0.0 AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // the FULL IVF index replayed bit-for-bit (round-13 promotion):
    // portable-hash seed selection, two integer Lloyd refinements
    // (argmin by exact int64 dist², floor-mean by the sign-safe
    // (sum − pmod) // n), final assignment, 3-cell integer routing,
    // then the s01-shaped double-cosine rescore over the probed
    // cells' members. The fixed iteration count unrolls to a CTE
    // chain (the BPE-trainer discipline).
    "s03_ann_ivf" ->
      s"""WITH sv AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS sv
        |  FROM embeddings),
        |c0 AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY hk, vec_id) - 1
        |      AS INTEGER) AS cell, sv AS cent
        |  FROM (SELECT vec_id, sv, ${graft.functions.PortableHashFunctions
              .polyHashSql("'ivf:' || CAST(vec_id AS VARCHAR)")} AS hk
        |        FROM sv)
        |  QUALIFY ROW_NUMBER() OVER (ORDER BY hk, vec_id) <= 16),
        |a1 AS (SELECT vec_id, sv, cell FROM (
        |  SELECT v.vec_id, v.sv, c.cell,
        |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
        |      list_sum(list_transform(range(1, 65),
        |        j -> (v.sv[j] - c.cent[j]) * (v.sv[j] - c.cent[j]))),
        |      c.cell) AS r
        |  FROM sv v CROSS JOIN c0 c) WHERE r = 1),
        |c1 AS (SELECT cell, list(m ORDER BY i) AS cent FROM (
        |  SELECT a.cell, g.range AS i,
        |    CAST((SUM(a.sv[g.range]) - ((SUM(a.sv[g.range]) % COUNT(*))
        |      + COUNT(*)) % COUNT(*)) // COUNT(*) AS BIGINT) AS m
        |  FROM a1 a CROSS JOIN range(1, 65) g
        |  GROUP BY a.cell, g.range) GROUP BY cell),
        |a2 AS (SELECT vec_id, sv, cell FROM (
        |  SELECT v.vec_id, v.sv, c.cell,
        |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
        |      list_sum(list_transform(range(1, 65),
        |        j -> (v.sv[j] - c.cent[j]) * (v.sv[j] - c.cent[j]))),
        |      c.cell) AS r
        |  FROM sv v CROSS JOIN c1 c) WHERE r = 1),
        |c2 AS (SELECT cell, list(m ORDER BY i) AS cent FROM (
        |  SELECT a.cell, g.range AS i,
        |    CAST((SUM(a.sv[g.range]) - ((SUM(a.sv[g.range]) % COUNT(*))
        |      + COUNT(*)) % COUNT(*)) // COUNT(*) AS BIGINT) AS m
        |  FROM a2 a CROSS JOIN range(1, 65) g
        |  GROUP BY a.cell, g.range) GROUP BY cell),
        |a3 AS (SELECT vec_id, sv, cell FROM (
        |  SELECT v.vec_id, v.sv, c.cell,
        |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
        |      list_sum(list_transform(range(1, 65),
        |        j -> (v.sv[j] - c.cent[j]) * (v.sv[j] - c.cent[j]))),
        |      c.cell) AS r
        |  FROM sv v CROSS JOIN c2 c) WHERE r = 1),
        |probes AS (SELECT q_id, cell FROM (
        |  SELECT v.vec_id AS q_id, c.cell,
        |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
        |      list_sum(list_transform(range(1, 65),
        |        j -> (v.sv[j] - c.cent[j]) * (v.sv[j] - c.cent[j]))),
        |      c.cell) AS r
        |  FROM sv v CROSS JOIN c2 c WHERE v.vec_id < 5) WHERE r <= 3),
        |cands AS (
        |  SELECT DISTINCT p.q_id, a.vec_id AS n_id
        |  FROM probes p JOIN a3 a USING (cell)
        |  WHERE a.vec_id <> p.q_id),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT cd.q_id, cd.n_id, list_cosine_similarity(q.v, c.v) AS cos
        |  FROM cands cd JOIN e q ON q.vec_id = cd.q_id
        |    JOIN e c ON c.vec_id = cd.n_id)
        |SELECT q_id, n_id, rank, round(cos, 6) + 0.0 AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // the FULL LSH pipeline replayed bit-for-bit (the s07 integer-
    // exact discipline, round-13 promotion from rows-only): plane
    // matrix regenerated from the portable double-hash product,
    // fixed-point dots → buckets and weakest-margin multi-probe in
    // exact int64, then the s01-shaped double-cosine rescore over the
    // candidate union. 48 planes × 64 dims and |corpus|×48 dots keep
    // the oracle itself linear in the corpus.
    "s02_ann_lsh" ->
      s"""WITH planes AS (
        |  SELECT pid, i, ${graft.functions.PortableHashFunctions
              .lshPlaneSql("s")} AS w
        |  FROM (SELECT t.range AS pid, d.range AS i,
        |          'lsh:' || CAST(t.range AS VARCHAR) || ':' ||
        |            CAST(d.range AS VARCHAR) AS s
        |        FROM range(48) t, range(64) d)),
        |pl AS (SELECT pid, list(w ORDER BY i) AS wl
        |       FROM planes GROUP BY pid),
        |sv AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS sv
        |  FROM embeddings),
        |dots AS (
        |  SELECT v.vec_id, p.pid,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      j -> p.wl[j] * v.sv[j])) AS BIGINT) AS dot
        |  FROM sv v CROSS JOIN pl p),
        |cbuck AS (
        |  SELECT vec_id, CAST(pid // 6 AS INTEGER) AS table_id,
        |    CAST(SUM(CASE WHEN dot > 0
        |      THEN 1 << CAST(pid % 6 AS INTEGER) ELSE 0 END) AS BIGINT)
        |      AS bucket
        |  FROM dots GROUP BY 1, 2),
        |qd AS (SELECT vec_id AS q_id, CAST(pid // 6 AS INTEGER) AS table_id,
        |         CAST(pid % 6 AS INTEGER) AS bit, dot
        |       FROM dots WHERE vec_id < 5),
        |qbase AS (SELECT q_id, table_id,
        |    CAST(SUM(CASE WHEN dot > 0 THEN 1 << bit ELSE 0 END) AS BIGINT)
        |      AS bucket
        |  FROM qd GROUP BY 1, 2),
        |wk AS (
        |  SELECT q_id, table_id,
        |    MAX(CASE WHEN r = 1 THEN bit END) AS j1,
        |    MAX(CASE WHEN r = 2 THEN bit END) AS j2,
        |    MAX(CASE WHEN r = 3 THEN bit END) AS j3
        |  FROM (SELECT q_id, table_id, bit,
        |          ROW_NUMBER() OVER (PARTITION BY q_id, table_id
        |            ORDER BY abs(dot), bit) AS r FROM qd)
        |  WHERE r <= 3 GROUP BY 1, 2),
        |probes AS (
        |  SELECT DISTINCT b.q_id, b.table_id,
        |    xor(xor(xor(b.bucket,
        |      CASE WHEN (s.range & 1) <> 0
        |        THEN CAST(1 << w.j1 AS BIGINT) ELSE 0 END),
        |      CASE WHEN (s.range & 2) <> 0
        |        THEN CAST(1 << w.j2 AS BIGINT) ELSE 0 END),
        |      CASE WHEN (s.range & 4) <> 0
        |        THEN CAST(1 << w.j3 AS BIGINT) ELSE 0 END) AS bucket
        |  FROM qbase b JOIN wk w USING (q_id, table_id), range(8) s),
        |cands AS (
        |  SELECT DISTINCT p.q_id, c.vec_id AS n_id
        |  FROM probes p JOIN cbuck c USING (table_id, bucket)
        |  WHERE c.vec_id <> p.q_id),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT cd.q_id, cd.n_id, list_cosine_similarity(q.v, c.v) AS cos
        |  FROM cands cd JOIN e q ON q.vec_id = cd.q_id
        |    JOIN e c ON c.vec_id = cd.n_id)
        |SELECT q_id, n_id, rank, round(cos, 6) + 0.0 AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // the s01 oracle at batch scale: the bounded-heap aggregate must
    // reproduce the ranking window's (cos DESC, n_id ASC) order exactly
    "s05_knn_batch" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 100 AND q.vec_id <> c.vec_id)
        |SELECT q_id, n_id, rank, round(cos, 6) + 0.0 AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // compaction must be invisible to serving: the pair census over
    // the FULL corpus plus the identity/accounting pins, TRUE by the
    // compactor's contract
    "s16_ann_segment_compact" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |topk AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id ASC) AS rank
        |    FROM scored) WHERE rank <= 3)
        |SELECT COUNT(*) AS n_pairs, TRUE AS compact_recall_ok,
        |  TRUE AS served_identical, TRUE AS segments_compacted
        |FROM topk""".stripMargin,

    // persistence must not cost recall: same contract shape as s04
    "s06_ann_persisted" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |topk AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id ASC) AS rank
        |    FROM scored) WHERE rank <= 3)
        |SELECT COUNT(*) AS n_pairs, TRUE AS persisted_recall_ok
        |FROM topk""".stripMargin,

    // the full SQ8 pipeline replayed: fixed-point floor scaling,
    // per-dim bounds, integer codes, code-dot shortlist, exact rescore
    "s07_ann_quantized" ->
      """WITH sv AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS sv
        |  FROM embeddings),
        |b AS (SELECT list(mn ORDER BY i) AS mnl, list(mx ORDER BY i) AS mxl
        |  FROM (SELECT i, MIN(sv[i+1]) AS mn, MAX(sv[i+1]) AS mx
        |        FROM sv, UNNEST(generate_series(0, 63)) AS t(i) GROUP BY i)),
        |codes AS (SELECT vec_id,
        |    list_transform(generate_series(0, 63), i ->
        |      CASE WHEN mxl[i+1] = mnl[i+1] THEN 0
        |           ELSE ((sv[i+1] - mnl[i+1]) * 255) // (mxl[i+1] - mnl[i+1])
        |      END) AS code
        |  FROM sv, b),
        |dots AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_sum(list_transform(generate_series(1, 64),
        |      j -> q.code[j] * c.code[j])) AS qdot
        |  FROM codes q JOIN codes c
        |    ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |short AS (SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY qdot DESC, n_id ASC) AS qrank
        |    FROM dots) WHERE qrank <= 10),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (SELECT s.q_id, s.n_id,
        |    list_cosine_similarity(eq.v, en.v) AS cos
        |  FROM short s JOIN e eq ON eq.vec_id = s.q_id
        |  JOIN e en ON en.vec_id = s.n_id)
        |SELECT q_id, n_id, rank, round(cos, 6) + 0.0 AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // the exact self-join restated in full: n_docs/n_pairs are the
    // DuckDB-recomputed exact top-K census; the boolean is the recall
    // contract the LSH route must meet (computed Spark-side vs the
    // Spark exact restatement, so float-tie order never cross-engines)
    "s08_ann_selfjoin" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id <> c.vec_id),
        |topk AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id ASC) AS rank
        |    FROM scored) WHERE rank <= 3)
        |SELECT COUNT(DISTINCT q_id) AS n_docs, COUNT(*) AS n_pairs,
        |  TRUE AS self_recall_ok FROM topk""".stripMargin,

    // the PQ gate: n_pairs from the exact restatement, the boolean is
    // the recall contract (the s04 discipline)
    "s09_ann_pq" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |topk AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id ASC) AS rank
        |    FROM scored) WHERE rank <= 3)
        |SELECT COUNT(*) AS n_pairs, TRUE AS pq_recall_ok FROM topk""".stripMargin,

    // the composed-index gate, same discipline
    "s10_ann_ivfpq" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |topk AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id ASC) AS rank
        |    FROM scored) WHERE rank <= 3)
        |SELECT COUNT(*) AS n_pairs, TRUE AS ivfpq_recall_ok FROM topk""".stripMargin,

    // n_pairs is independently derivable (5 queries × top-3); the
    // booleans are the recall contract the engine must meet
    "s04_ann_recall" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |topk AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id ASC) AS rank
        |    FROM scored) WHERE rank <= 3)
        |SELECT COUNT(*) AS n_pairs, TRUE AS lsh_recall_ok,
        |  TRUE AS ivf_recall_ok FROM topk""".stripMargin,

    // s01's restatement with the same-label predicate applied in the
    // pair generation (the pre-filter), ranking over survivors only
    "s14_ann_filtered" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id, c.label AS label,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
        |    AND c.label = q.label)
        |SELECT q_id, n_id, label, rank, round(cos, 6) + 0.0 AS cos FROM (
        |  SELECT q_id, n_id, label, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // n_pairs restates the exact FILTERED baseline's pair count; the
    // booleans are the recall + non-vacuity contract
    "s15_ann_filtered_ivf" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
        |    AND c.label < 8),
        |topk AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id ASC) AS rank
        |    FROM scored) WHERE rank <= 3)
        |SELECT COUNT(*) AS n_pairs, TRUE AS filtered_ivf_recall_ok,
        |  TRUE AS predicate_rejected_some FROM topk""".stripMargin,

    // s01's restatement with the near-dup exclusion band applied
    // before ranking
    "s12_hard_negatives" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.v, c.v) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id)
        |SELECT q_id, n_id, rank, round(cos, 6) + 0.0 AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rank
        |  FROM scored WHERE cos < 0.35) WHERE rank <= 3
        |ORDER BY q_id, rank""".stripMargin,

    // the multimodal-ANN gate: the pair census restated from the m07
    // encoder arithmetic (char-code poly fold → 16 integer dims →
    // cosine top-3); the boolean is the in-plan recall contract
    "s11_multimodal_ann" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ''), ch -> ord(ch)) AS codes
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id, j,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(j, len(codes), 16), i -> codes[i + 1])),
        |      (a, b) -> (a * 31 + b) % 1000000007) % 2048 AS DOUBLE) AS v
        |  FROM c, UNNEST(generate_series(0, 15)) AS t(j)),
        |e AS (SELECT doc_id, list(v ORDER BY j) AS v FROM dims
        |      GROUP BY doc_id),
        |scored AS (
        |  SELECT q.doc_id AS q_id, n.doc_id AS n_id,
        |    list_cosine_similarity(q.v, n.v) AS cos
        |  FROM e q JOIN e n ON q.doc_id < 5 AND q.doc_id <> n.doc_id),
        |topk AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id ASC) AS rank
        |    FROM scored) WHERE rank <= 3)
        |SELECT COUNT(*) AS n_pairs, TRUE AS mm_recall_ok FROM topk""".stripMargin
  )
}
