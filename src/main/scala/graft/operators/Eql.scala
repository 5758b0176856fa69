package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ES EQL (Event Query Language, the security-analytics surface) —
  * the `sequence` query: ordered event chains per entity within a
  * time window,
  *
  * {{{ sequence by user with maxspan=1h [step1] [step2] [step3] }}}
  *
  * **Matching semantics (documented adjudication)**: one result per
  * ANCHOR (each event matching step 1), completed greedily — every
  * subsequent step takes the EARLIEST event of that step strictly
  * after the previous one in (time, tieBreaker) order, and the chain
  * survives iff last − first ≤ maxspan. Greedy-earliest minimizes
  * the completion time at every prefix (the exchange argument), so
  * an anchor completes within maxspan under greedy matching iff ANY
  * chain from that anchor does — the match SET of anchors equals
  * ES's, while the replayable greedy chain is canonical where ES's
  * internal state machine is not. Strictness includes the tie
  * breaker, so an event can never fill two adjacent steps of the
  * same chain even at an identical timestamp, and ES's
  * `tiebreaker_field` ordering contract is honored.
  *
  * Scale shape — per step, the AsofJoin union discipline: chain rows
  * and step events are tagged and unioned, shuffled ONCE on the
  * entity key, and a descending (time, tie) scan carries the
  * earliest qualifying step event backward onto each chain row via
  * `last(_, ignoreNulls)` — k−1 linear passes for a k-step
  * sequence, never an interval cross product, no broadcast
  * requirement on either side.
  */
object Eql {

  /** `until` — EQL's pending-state expiry: a chain DIES if an until
    * event for the same entity lands strictly BETWEEN two consecutive
    * chain events in (time, tie) order (ES discards the partial
    * state; the completed last transition needs no check — the
    * sequence already matched). An event matching BOTH the next step
    * and the until predicate kills the chain (the conservative
    * reading, documented — ES's state machine processes the until
    * first). The until carrier rides the SAME union+window pass as
    * the step carrier — no extra shuffle.
    */
  def sequence(events: DataFrame, byCol: String, tsCol: String,
               tieCol: String, steps: Seq[Column],
               maxspanMs: Long,
               until: Option[Column] = None): DataFrame = {
    require(steps.size >= 2, "a sequence needs at least two steps")
    require(maxspanMs > 0, s"maxspan must be positive, got $maxspanMs")
    Seq(byCol, tsCol, tieCol).foreach(c =>
      require(events.columns.contains(c), s"column `$c` not in frame"))
    val reserved = Seq("_t", "_tie", "_side", "_payload", "_upayload")
    require(!reserved.exists(events.columns.contains),
      s"columns ${reserved.mkString(", ")} are reserved")
    val k = steps.size
    val anchors = events.filter(steps.head)
      .select(col(byCol), col(tsCol).as("ts_1"),
        col(tieCol).as("id_1"))
    val chained = steps.zipWithIndex.tail.foldLeft(anchors) {
      case (cur, (pred, idx)) =>
        val n = idx + 1 // this step's 1-based number
        val stepEvents = events.filter(pred)
          .select(col(byCol), col(tsCol).as("_st"),
            col(tieCol).as("_sid"))
        val payloadStruct = struct(col("_st"), col("_sid"))
        val nullPayload = lit(null).cast(
          stepEvents.select(payloadStruct).schema.head.dataType)
        val curCols = cur.columns.toSeq
        val l = cur
          .withColumn("_t", col(s"ts_$idx"))
          .withColumn("_tie", col(s"id_$idx"))
          .withColumn("_side", lit(0))
          .withColumn("_payload", nullPayload)
          .withColumn("_upayload", nullPayload)
        val r = stepEvents
          .withColumn("_t", col("_st"))
          .withColumn("_tie", col("_sid"))
          .withColumn("_side", lit(1))
          .withColumn("_payload", payloadStruct)
          .withColumn("_upayload", nullPayload)
          .select(col(byCol) +: curCols.filterNot(_ == byCol).map(c =>
            lit(null).cast(cur.schema(c).dataType).as(c)) ++:
            Seq(col("_t"), col("_tie"), col("_side"), col("_payload"),
              col("_upayload")): _*)
        val u = until.map { upred =>
          events.filter(upred)
            .select(col(byCol), col(tsCol).as("_st"),
              col(tieCol).as("_sid"))
            .withColumn("_t", col("_st"))
            .withColumn("_tie", col("_sid"))
            .withColumn("_side", lit(2))
            .withColumn("_payload", nullPayload)
            .withColumn("_upayload", payloadStruct)
            .select(col(byCol) +: curCols.filterNot(_ == byCol).map(c =>
              lit(null).cast(cur.schema(c).dataType).as(c)) ++:
              Seq(col("_t"), col("_tie"), col("_side"),
                col("_payload"), col("_upayload")): _*)
        }
        // descending (time, tie) scan: at any chain row, the carried
        // payload is the EARLIEST step event strictly later in
        // (time, tie) order — sides order the chain row FIRST at an
        // identical (time, tie), which is exactly the strictness
        // rule; the until carrier rides the same scan
        val w = Window.partitionBy(col(byCol))
          .orderBy(col("_t").desc, col("_tie").desc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val unioned0 = l.select(
            col(byCol) +: curCols.filterNot(_ == byCol).map(col) ++:
            Seq(col("_t"), col("_tie"), col("_side"), col("_payload"),
              col("_upayload")): _*)
          .unionByName(r)
        val unioned = u.fold(unioned0)(unioned0.unionByName(_))
        val stepOk = col("_payload").isNotNull
        // the chain survives the transition only if the next step
        // lands strictly BEFORE the next until in (time, tie) order
        val untilOk = col("_upayload").isNull ||
          col("_payload._st") < col("_upayload._st") ||
          (col("_payload._st") === col("_upayload._st") &&
            col("_payload._sid") < col("_upayload._sid"))
        unioned
          .withColumn("_payload",
            last(col("_payload"), ignoreNulls = true).over(w))
          .withColumn("_upayload",
            last(col("_upayload"), ignoreNulls = true).over(w))
          .filter(col("_side") === 0 && stepOk &&
            (if (until.isEmpty) lit(true) else untilOk))
          .withColumn(s"ts_$n", col("_payload._st"))
          .withColumn(s"id_$n", col("_payload._sid"))
          .drop("_t", "_tie", "_side", "_payload", "_upayload")
    }
    // NTZ columns cast through LTZ for the epoch arithmetic — the
    // session-zone shift cancels in the difference, so the span is
    // zone-independent either way
    def ms(c: Column): Column = unix_millis(c.cast("timestamp_ltz"))
    chained
      .filter(ms(col(s"ts_$k")) - ms(col("ts_1")) <= maxspanMs)
      .orderBy(col(byCol), col("id_1"))
  }
}
