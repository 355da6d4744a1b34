package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE-style sequence pattern detection over event streams,
  * expressed as cumulative window functions — the classic funnel query's
  * per-OCCURRENCE sibling: instead of counting users per stage, emit one
  * row per concrete (stage1, stage2, stage3) occurrence, with a VETO
  * event type that must not occur inside the matched span.
  *
  * The per-user stream is processed with running "latest qualifying
  * event" trackers, so the whole pattern automaton is ONE shuffle keyed
  * by user (the partition key every per-user op here shares) and two
  * cumulative window passes over the same sort — no self-joins, no
  * exploding candidate sets, no per-row recursion. At 1000 executors
  * each user's (typically tiny) stream matches independently; a hot user
  * degrades to one fat partition exactly like any per-entity window op,
  * and the trackers are O(1) state per row regardless of stream length.
  */
object SequencePatterns {

  /** Match `s1 → s2 → s3` per user with veto semantics: for every `s3`
    * event P, the match binds the LATEST preceding `s2` event C that
    * itself has a preceding `s1` event V (latest-before-C), and the
    * match survives only if no `veto` event falls between V and P
    * (a veto at or before V is fine — the pattern looks at the matched
    * span only). Each `s3` occurrence yields at most one row.
    *
    * Row order within a user is (tsCol, idCol) — the id tiebreak keeps
    * the automaton deterministic even on timestamp ties.
    *
    * @return (userCol, v_ts, c_ts, p_ts) — one row per match */
  def threeStageWithVeto(events: DataFrame, userCol: String, idCol: String,
      tsCol: String, typeCol: String, s1: String, s2: String, s3: String,
      veto: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__tsu"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = events.select(col(userCol), col(idCol), col(typeCol),
      col(tsCol).as("__ts"), unix_micros(col(tsCol)).as("__tsu"))
    // pass 1: latest s1 and latest veto strictly before each row
    val p1 = base
      .withColumn("__lv", max(when(col(typeCol) === s1, col("__tsu"))).over(w))
      .withColumn("__le", max(when(col(typeCol) === veto, col("__tsu"))).over(w))
    // pass 2: latest QUALIFYING s2 (one that saw an s1) before each row,
    // carrying the s1 timestamp captured AT that s2 row. max_by keeps the
    // tracked pair on one aggregate — no struct ordering, and the oracle's
    // SQL dialect spells it arg_max
    val cond = col(typeCol) === s2 && col("__lv").isNotNull
    val p2 = p1
      .withColumn("__c", max(when(cond, col("__tsu"))).over(w))
      .withColumn("__v", max_by(when(cond, col("__lv")),
        when(cond, col("__tsu"))).over(w))
    p2.filter(col(typeCol) === s3 && col("__c").isNotNull &&
        (col("__le").isNull || col("__le") <= col("__v")))
      .select(col(userCol),
        timestamp_micros(col("__v")).as("v_ts"),
        timestamp_micros(col("__c")).as("c_ts"),
        col("__ts").as("p_ts"))
  }
}
