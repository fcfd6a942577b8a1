package graft.sources

/** DuckDB oracle SQL for the DML-catalog query registry
  * ([[RowCatalogQueries]]) — split out under the repo's 1,500-line
  * discipline; every string is byte-identical to its pre-split form. */
object RowCatalogOracles {

  /** The lifecycle's four statements folded into one relational
    * restatement over the raw table (shared by q106/q108/q109). */
  private[graft] val lifecycleCtes =
    """WITH t0 AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_orderstatus AS status
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |src AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_orderstatus AS status
      |  FROM orders WHERE o_orderkey % 5 = 0),
      |merged AS (
      |  SELECT t.k,
      |    CASE WHEN s.k IS NOT NULL AND t.status = 'F'
      |         THEN t.cents + s.cents ELSE t.cents END AS cents,
      |    t.status
      |  FROM t0 t LEFT JOIN src s ON t.k = s.k
      |  WHERE s.k IS NULL OR t.status = 'F'
      |  UNION ALL
      |  SELECT s.k, s.cents, s.status
      |  FROM src s LEFT JOIN t0 t ON t.k = s.k WHERE t.k IS NULL)""".stripMargin

  val oracles: Map[String, String] = Map(
    // all four slices restated — manifest compaction must be
    // observationally invisible; the pins are TRUE by its contract
    "q149_dml_rewrite_manifests" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  TRUE AS chain_collapsed, TRUE AS tt_ok
        |FROM orders WHERE o_orderkey % 8 IN (0, 1, 2, 3)
        |ORDER BY k""".stripMargin,

    // the snapshot lineage restated: two appends, the group-emptying
    // delete (removals only), the group-1 rewrite (overwrite); row
    // counts and per-version visibility from the same slices
    "q150_dml_snapshots_table" ->
      """WITH a AS (SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
        |           WHERE o_orderkey % 3 = 0),
        |b AS (SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
        |      WHERE o_orderkey % 3 = 1),
        |u AS (SELECT k FROM a UNION ALL SELECT k FROM b),
        |o AS (SELECT k FROM u WHERE k % 2 <> 0)
        |SELECT CAST(0 AS INTEGER) AS version,
        |  CAST(NULL AS INTEGER) AS parent_version, 'create' AS operation,
        |  CAST(0 AS BIGINT) AS n_rows, FALSE AS is_current,
        |  CAST(0 AS BIGINT) AS n_visible
        |UNION ALL SELECT 1, 0, 'append', (SELECT COUNT(*) FROM a), FALSE,
        |  (SELECT COUNT(*) FROM a)
        |UNION ALL SELECT 2, 1, 'append', (SELECT COUNT(*) FROM u), FALSE,
        |  (SELECT COUNT(*) FROM u)
        |UNION ALL SELECT 3, 2, 'delete', (SELECT COUNT(*) FROM o), FALSE,
        |  (SELECT COUNT(*) FROM o)
        |UNION ALL SELECT 4, 3, 'overwrite', (SELECT COUNT(*) FROM o), TRUE,
        |  (SELECT COUNT(*) FROM o)
        |ORDER BY version""".stripMargin,

    // both slices restated — orphan cleanup must never touch a
    // referenced file; the pin is TRUE by its contract
    "q151_dml_orphan_cleanup" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  TRUE AS orphan_removed
        |FROM orders WHERE o_orderkey % 9 IN (0, 4)
        |ORDER BY k""".stripMargin,

    // the manifest-file shapes restated from the write discipline:
    // one file per touched group per commit, so an incremental
    // manifest's entry count is its slice's distinct group count and
    // the rewritten head checkpoint carries both slices' files
    "q153_dml_manifests_table" ->
      """WITH a AS (SELECT COUNT(DISTINCT o_orderkey % 4) AS g FROM orders
        |           WHERE o_orderkey % 3 = 0),
        |b AS (SELECT COUNT(DISTINCT o_orderkey % 4) AS g FROM orders
        |      WHERE o_orderkey % 3 = 1)
        |SELECT CAST(0 AS INTEGER) AS version, TRUE AS is_checkpoint,
        |  CAST(NULL AS INTEGER) AS parent_version,
        |  CAST(0 AS BIGINT) AS n_entries, CAST(0 AS BIGINT) AS n_removed
        |UNION ALL
        |SELECT 1, FALSE, 0, (SELECT g FROM a), 0
        |UNION ALL
        |SELECT 2, TRUE, NULL,
        |  (SELECT g FROM a) + (SELECT g FROM b), 0
        |ORDER BY version""".stripMargin,

    // the three CDC row classes restated: matched 'F' keys surface as
    // pre/post pairs (cents doubled by the self-merge), matched
    // non-'F' keys as deletes, source-only keys as inserts
    "q152_dml_cdf_updates" ->
      """WITH t0 AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |src AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT k, cents, status, 'update_preimage' AS _change FROM t0
        |  WHERE k % 5 = 0 AND status = 'F'
        |UNION ALL
        |SELECT k, cents * 2, status, 'update_postimage' FROM t0
        |  WHERE k % 5 = 0 AND status = 'F'
        |UNION ALL
        |SELECT k, cents, status, 'delete' FROM t0
        |  WHERE k % 5 = 0 AND status <> 'F'
        |UNION ALL
        |SELECT k, cents, status, 'insert' FROM src WHERE k % 7 <> 0
        |ORDER BY k, _change""".stripMargin,

    "q106_merge_into" ->
      s"""$lifecycleCtes
        |SELECT k, cents, status FROM merged
        |WHERE k % 97 <> 0 ORDER BY k""".stripMargin,

    // the four retained versions restated from raw orders: v0 empty,
    // v1 the seed, v2 post-merge, v3 post-delete
    "q107_version_asof" ->
      s"""$lifecycleCtes
        |SELECT 0 AS version, CAST(0 AS BIGINT) AS n,
        |       CAST(0 AS BIGINT) AS sum_cents
        |UNION ALL
        |SELECT 1, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM t0
        |UNION ALL
        |SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM merged
        |UNION ALL
        |SELECT 3, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM merged
        |  WHERE k % 97 <> 0
        |ORDER BY version""".stripMargin,

    "q108_merge_mor" ->
      s"""$lifecycleCtes
        |SELECT k, cents, status FROM merged
        |WHERE k % 97 <> 0 ORDER BY k""".stripMargin,

    // deletion vectors must be observationally identical to the
    // record-based MOR path — the q106/q108 restatement verbatim
    "q154_dml_deletion_vectors" ->
      s"""$lifecycleCtes
        |SELECT k, cents, status FROM merged
        |WHERE k % 97 <> 0 ORDER BY k""".stripMargin,

    "q109_change_feed" ->
      s"""$lifecycleCtes,
        |fin AS (SELECT k, cents, status FROM merged WHERE k % 97 <> 0),
        |ins AS (SELECT k, cents, status FROM fin
        |        EXCEPT ALL SELECT k, cents, status FROM t0),
        |del AS (SELECT k, cents, status FROM t0
        |        EXCEPT ALL SELECT k, cents, status FROM fin)
        |SELECT k, cents, status, 'insert' AS _change FROM ins
        |UNION ALL
        |SELECT k, cents, status, 'delete' AS _change FROM del
        |ORDER BY k, _change""".stripMargin,

    // compaction must be observationally invisible — q108's content
    // restatement verbatim
    "q110_dml_optimize" ->
      s"""$lifecycleCtes
        |SELECT k, cents, status FROM merged
        |WHERE k % 97 <> 0 ORDER BY k""".stripMargin,

    // the middle band restated from raw orders
    "q115_dml_file_skip" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders WHERE o_orderkey % 3 = 1
        |GROUP BY 1 ORDER BY status""".stripMargin,

    // the middle name band restated from raw part
    "q140_dml_string_skip" ->
      """WITH b AS (
        |  SELECT 'm_' || p_name || '_' || CAST(p_partkey AS VARCHAR) AS name,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents
        |  FROM part WHERE p_partkey % 3 = 1)
        |SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |  MIN(name) AS min_name, MAX(name) AS max_name
        |FROM b WHERE name >= 'm' AND name < 'n'""".stripMargin,

    // both legs select the SAME middle band (o_orderkey % 3 = 1),
    // restated from raw orders with the engine's offset subtracted out
    "q142_dml_column_skip" ->
      """WITH b AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders WHERE o_orderkey % 3 = 1)
        |SELECT 'num' AS leg, COUNT(*) AS n,
        |  CAST(SUM(c) AS BIGINT) AS sum_base_cents FROM b
        |UNION ALL
        |SELECT 'str', COUNT(*), CAST(SUM(c) AS BIGINT) FROM b
        |ORDER BY leg""".stripMargin,

    // the manifest-answered count recomputed relationally
    "q124_dml_manifest_count" ->
      s"""$lifecycleCtes
        |SELECT COUNT(*) AS n FROM merged WHERE k % 97 <> 0""".stripMargin,

    // as-of v2's instant == the post-MERGE pre-DELETE state
    "q123_dml_timestamp_travel" ->
      s"""$lifecycleCtes
        |SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM merged""".stripMargin,

    // the broadcast-enrichment join restated over the lifecycle CTEs
    "q122_dml_stats_join" ->
      s"""$lifecycleCtes
        |SELECT m.status, COUNT(*) AS n,
        |  CAST(SUM(m.cents) AS BIGINT) AS sum_cents,
        |  CAST(SUM(o.o_custkey) AS BIGINT) AS cust_sum
        |FROM merged m JOIN orders o ON o.o_orderkey = m.k
        |WHERE m.k % 97 <> 0
        |GROUP BY m.status ORDER BY m.status""".stripMargin,

    // the two subquery legs restated: survivors are the seed minus the
    // deleted keys; the bump hits survivors in the update subquery
    "q121_dml_subquery" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT)
        |    + (CASE WHEN o_orderkey % 27 = 0 THEN 1000 ELSE 0 END) AS cents,
        |  o_orderstatus AS status
        |FROM orders
        |WHERE o_orderkey % 9 = 0 AND o_orderkey % 18 <> 0
        |ORDER BY k""".stripMargin,

    // physical residency restated from the group function: the final
    // lifecycle state bucketed by k mod 4
    "q120_metadata_columns" ->
      s"""$lifecycleCtes
        |SELECT CAST(k % 4 AS INTEGER) AS _group, COUNT(*) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM merged WHERE k % 97 <> 0
        |GROUP BY 1 ORDER BY _group""".stripMargin,

    // pre-widening slice (narrow, re-read wide at the head) + the
    // post-widening slice with values past Int.MaxValue; the v1 leg
    // keeps its snapshot-time INTEGER type
    "q143_dml_type_widening" ->
      """WITH a AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(o_custkey AS INTEGER) AS v
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |b AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(o_custkey AS BIGINT) + 3000000000 AS v
        |  FROM orders WHERE o_orderkey % 5 = 2)
        |SELECT t.k, t.v, a.v AS v_v1
        |FROM (SELECT k, CAST(v AS BIGINT) AS v FROM a
        |      UNION ALL SELECT k, v FROM b) t
        |LEFT JOIN a ON t.k = a.k
        |ORDER BY t.k""".stripMargin,

    // survivors = seed minus the eq-deleted band, plus the
    // resurrected (doubled-cents) re-insert; compaction invisible
    "q145_dml_equality_delete" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey % 8 = 0 AND o_orderkey % 16 <> 0
        |UNION ALL
        |SELECT CAST(o_orderkey AS BIGINT),
        |  CAST(round(o_totalprice * 100) AS BIGINT) * 2
        |FROM orders WHERE o_orderkey % 32 = 0
        |ORDER BY k""".stripMargin,

    // matched keys (mod 18) doubled + stamped, source-only inserted
    // complete, target-only NULL in the auto-added column
    "q144_dml_merge_evolution" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT)
        |    * (CASE WHEN o_orderkey % 18 = 0 THEN 2 ELSE 1 END) AS cents,
        |  CASE WHEN o_orderkey % 6 = 0 THEN o_orderstatus
        |       ELSE NULL END AS status
        |FROM orders WHERE o_orderkey % 9 = 0 OR o_orderkey % 6 = 0
        |ORDER BY k""".stripMargin,

    // the three-way sync restated: matched keys (mod 30) doubled,
    // source-only keys inserted as seeded, target-only keys deleted
    // when the PRE-merge cents exceeded the threshold else archived
    "q117_dml_merge_sync" ->
      """WITH u AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS c0,
        |    o_orderstatus AS st,
        |    o_orderkey % 30 = 0 AS matched,
        |    o_orderkey % 10 = 0 AS in_target
        |  FROM orders WHERE o_orderkey % 10 = 0 OR o_orderkey % 15 = 0)
        |SELECT k,
        |  CAST(c0 * (CASE WHEN matched THEN 2 ELSE 1 END) AS BIGINT)
        |    AS cents,
        |  CASE WHEN in_target AND NOT matched THEN 'S' ELSE st END
        |    AS status
        |FROM u
        |WHERE NOT (in_target AND NOT matched AND c0 > 25000000)
        |ORDER BY k""".stripMargin,

    // the post-REPLACE state restated; ctas_ok is TRUE by contract
    "q132_dml_ctas" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) > 20000000
        |       THEN 'BIG' ELSE 'SMALL' END AS size,
        |  TRUE AS ctas_ok
        |FROM orders WHERE o_orderkey % 28 = 0 ORDER BY k""".stripMargin,

    // the co-bucketed join restated: keys in both slices are % 30 = 0
    "q131_dml_spj" ->
      """SELECT CAST(o_orderkey % 8 AS BIGINT) AS band, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(SUM(CAST(o_custkey AS BIGINT)) AS BIGINT) AS sum_cust
        |FROM orders WHERE o_orderkey % 30 = 0
        |GROUP BY 1 ORDER BY band""".stripMargin,

    // default-filled and explicit slices restated side by side
    "q130_dml_default_columns" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CASE WHEN o_orderkey % 12 = 0 THEN 42
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents,
        |  CASE WHEN o_orderkey % 12 = 0 THEN 'NEW'
        |       ELSE o_orderstatus END AS status
        |FROM orders WHERE o_orderkey % 12 IN (0, 5)
        |ORDER BY k""".stripMargin,

    // the metadata-answered extrema recomputed relationally
    "q129_dml_stats_minmax" ->
      s"""$lifecycleCtes
        |SELECT CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k, COUNT(*) AS n
        |FROM merged WHERE k % 97 <> 0""".stripMargin,

    // the snapshot lineage recomputed relationally: rows per version
    // from the lifecycle CTEs, files per version = distinct non-empty
    // groups (one file per touched group per commit, by the clustered
    // write distribution)
    "q127_dml_history" ->
      s"""$lifecycleCtes,
        |fin AS (SELECT k, cents, status FROM merged WHERE k % 97 <> 0),
        |h AS (
        |  SELECT 0 AS version, 0 AS n_files, 0 AS n_rows
        |  UNION ALL SELECT 1, COUNT(DISTINCT k % 4), COUNT(*) FROM t0
        |  UNION ALL SELECT 2, COUNT(DISTINCT k % 4), COUNT(*) FROM merged
        |  UNION ALL SELECT 3, COUNT(DISTINCT k % 4), COUNT(*) FROM fin)
        |SELECT CAST(version AS INTEGER) AS version,
        |  CAST(n_files AS BIGINT) AS n_files,
        |  CAST(n_rows AS BIGINT) AS n_rows,
        |  version = 3 AS is_current
        |FROM h ORDER BY version""".stripMargin,

    // published state = both slices; the isolation pins are TRUE by
    // the WAP contract
    "q128_dml_wap" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  TRUE AS staged_invisible, TRUE AS audit_saw_staged
        |FROM orders WHERE o_orderkey % 8 IN (0, 3) ORDER BY k""".stripMargin,

    // rollback undid the DELETE and compaction/expiry are invisible:
    // final content = both inserted slices; the tag pin is TRUE by the
    // retention contract
    "q141_dml_procedures" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  TRUE AS tag_ok
        |FROM orders WHERE o_orderkey % 11 IN (0, 3) ORDER BY k""".stripMargin,

    // the published slices; the tag/branch pins are TRUE by the named
    // refs' contract (frozen tag, staged-superset branch)
    "q138_dml_tags" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  TRUE AS tag_frozen, TRUE AS branch_saw_staged
        |FROM orders WHERE o_orderkey % 8 IN (0, 1) ORDER BY k""".stripMargin,

    // the needle lookup restated relationally — the bloom must be
    // invisible to results
    "q148_dml_bloom_skip" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey % 4 IN (0, 1)
        |  AND CAST(round(o_totalprice * 100) AS BIGINT) =
        |    (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |     FROM orders WHERE o_orderkey = 32)
        |ORDER BY k""".stripMargin,

    // the five aggregates restated over the same two slices
    "q147_dml_column_minmax" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS min_cents,
        |  CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS max_cents,
        |  MIN(o_orderdate) AS min_ts, MAX(o_orderdate) AS max_ts
        |FROM orders WHERE o_orderkey % 6 IN (0, 3)""".stripMargin,

    // refs: main at head v2, the tag pinned at v1, the staged branch
    // forked from v2; per-ref visibility restated from the slices
    "q146_dml_refs_table" ->
      """WITH a AS (SELECT COUNT(*) AS n FROM orders WHERE o_orderkey % 8 = 0),
        |     b AS (SELECT COUNT(*) AS n FROM orders WHERE o_orderkey % 8 = 1),
        |     c AS (SELECT COUNT(*) AS n FROM orders WHERE o_orderkey % 8 = 2)
        |SELECT 'audit' AS ref_name, 'BRANCH' AS ref_type, 2 AS version,
        |       CAST(a.n + b.n + c.n AS BIGINT) AS n_visible FROM a, b, c
        |UNION ALL
        |SELECT 'main', 'BRANCH', 2, CAST(a.n + b.n AS BIGINT) FROM a, b
        |UNION ALL
        |SELECT 'release', 'TAG', 1, CAST(a.n AS BIGINT) FROM a
        |ORDER BY ref_name""".stripMargin,

    // both slices restated from raw orders — the engine's answer must
    // be layout-invariant across the spec boundary
    "q125_dml_spec_evolution" ->
      """SELECT CAST(o_orderkey % 8 AS BIGINT) AS band, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders WHERE o_orderkey % 13 IN (0, 5)
        |GROUP BY 1 ORDER BY band""".stripMargin,

    // the rollup restated; the sketch pins are TRUE by the KMV
    // contract (exact under K distinct, ±10% at high cardinality)
    "q155_dml_ndv_stats" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  TRUE AS ndv_status_exact, TRUE AS ndv_k_close
        |FROM orders WHERE o_orderkey % 4 IN (0, 1)
        |GROUP BY 1 ORDER BY status""".stripMargin,

    // native + imported slices restated; the pins are TRUE by the
    // add_files contract (zero copies, pre-import snapshot intact)
    "q156_dml_add_files" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  o_orderstatus AS status, TRUE AS zero_copy, TRUE AS tt_ok
        |FROM orders WHERE o_orderkey % 9 = 1
        |   OR (o_orderkey % 9 = 4
        |       AND o_orderdate >= TIMESTAMP '1995-01-01'
        |       AND o_orderdate < TIMESTAMP '1995-04-01')
        |ORDER BY k""".stripMargin,

    // both slices + the cross-spec MERGE restated: matched keys
    // (% 26 = 0, all in the old-spec slice) doubled, new keys
    // (% 13 = 7) inserted — layout-invariant across the spec boundary
    "q157_dml_cross_spec_merge" ->
      """WITH st AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT)
        |      * (CASE WHEN o_orderkey % 26 = 0 THEN 2 ELSE 1 END) AS cents
        |  FROM orders WHERE o_orderkey % 13 IN (0, 5, 7))
        |SELECT CAST(k % 8 AS BIGINT) AS band, COUNT(*) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM st GROUP BY 1 ORDER BY band""".stripMargin,

    // the daily rollup restated over raw events
    "q126_dml_days_transform" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_v
        |FROM events WHERE event_id % 17 = 0
        |GROUP BY 1 ORDER BY day_start""".stripMargin,

    // the band rollup restated over raw orders
    "q137_dml_identity_transform" ->
      """SELECT CAST(o_orderkey % 10 AS BIGINT) AS band, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders WHERE o_orderkey % 7 = 0
        |  AND o_orderkey % 10 BETWEEN 3 AND 5
        |GROUP BY 1 ORDER BY band""".stripMargin,

    // one base file per group on the lifecycle head — per-file rows
    // and zone maps restated as per-group aggregates of the final
    // state
    "q136_dml_files_table" ->
      s"""$lifecycleCtes,
        |fin AS (SELECT k, cents, status FROM merged WHERE k % 97 <> 0)
        |SELECT CAST(k % 4 AS INTEGER) AS grp, 'base' AS kind,
        |  COUNT(*) AS n_rows, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM fin GROUP BY 1 ORDER BY grp""".stripMargin,

    // one base file, zero deltas per group on the COW lifecycle head;
    // row counts restate the final state per group
    "q139_dml_partitions_table" ->
      s"""$lifecycleCtes,
        |fin AS (SELECT k, cents, status FROM merged WHERE k % 97 <> 0)
        |SELECT CAST(0 AS INTEGER) AS spec, CAST(k % 4 AS INTEGER) AS grp,
        |  CAST(1 AS BIGINT) AS n_files, CAST(0 AS BIGINT) AS n_delta_files,
        |  COUNT(*) AS n_rows, TRUE AS has_bytes
        |FROM fin GROUP BY 2 ORDER BY spec, grp""".stripMargin,

    // the monthly rollup restated over raw orders (date_trunc returns
    // DATE in DuckDB — cast to TIMESTAMP for schema parity)
    "q134_dml_months_transform" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
        |    AS month_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_v
        |FROM orders WHERE o_orderkey % 19 = 0
        |GROUP BY 1 ORDER BY month_start""".stripMargin,

    // post-rollback head == the seed; the bad DELETE's victims are
    // exactly the k ≡ 0 (mod 5) seed rows
    "q135_dml_rollback" ->
      """WITH seed AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 6 = 1)
        |SELECT k, cents, (k % 5 = 0) AS deleted_in_v2
        |FROM seed ORDER BY k""".stripMargin,

    // the whole lifecycle restated: seed (pre-rename files) + second
    // slice (post-rename files) + the COW update, with the v1 snapshot
    // re-joined under its snapshot-time column name
    "q133_dml_rename_column" ->
      """WITH seed AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 4 = 1),
        |add2 AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 4 = 2),
        |fin AS (SELECT k,
        |    CASE WHEN k % 10 = 3 THEN cents + 7 ELSE cents END AS amount
        |  FROM (SELECT * FROM seed UNION ALL SELECT * FROM add2))
        |SELECT f.k, f.amount, s.cents AS cents_v1
        |FROM fin f LEFT JOIN seed s USING (k)
        |ORDER BY f.k""".stripMargin,

    // insert + self-merge restated: a key ≡ 44 (mod 66) had its cents
    // doubled by the MERGE (t.cents + src.cents with src ≡ the seed)
    "q116_dml_bucket_transform" ->
      """SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |    * (CASE WHEN o_orderkey % 66 = 44 THEN 2 ELSE 1 END) AS cents,
        |  CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS status
        |FROM orders WHERE o_orderkey % 11 = 0 ORDER BY k""".stripMargin,

    // post-vacuum current content + the retention contract literals
    "q111_dml_vacuum" ->
      s"""$lifecycleCtes
        |SELECT COUNT(*) AS n_rows, CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |  2 AS n_versions, TRUE AS reclaimed, TRUE AS expired_read_fails
        |FROM merged WHERE k % 97 <> 0""".stripMargin
  )
}
