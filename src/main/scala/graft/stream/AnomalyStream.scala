package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming z-score anomaly detection — the unbounded form of the
  * `anomaly_zscore` registry key: flag each arriving metric value against
  * its group's RUNNING distribution instead of a full-corpus aggregate.
  *
  * State is one Welford accumulator (n, mean, M2) per group key —
  * O(#event types) total, an enum-cardinality bound, so no watermark/TTL
  * is needed (unlike the dedup state, which is corpus-keyed and
  * horizon-bounded). Each event scores against the statistics of all
  * PRIOR events (its own value joins the state after scoring — a point
  * can't vouch for itself), with a warm-up floor below which nothing
  * flags. Within a micro-batch, rows apply in `event_id` order so replays
  * and splits of the same prefix produce identical flags (MemoryStream
  * batch iterators carry no order contract).
  *
  * Scale posture: flatMapGroupsWithState shuffles each micro-batch once
  * on the group key — batch-proportional, never history-proportional;
  * the emitted stream carries only flagged rows. The skew caveat of any
  * enum-keyed grouping (one task per hot type PER BATCH) is bounded by
  * the micro-batch size, not the corpus.
  */
object AnomalyStream {

  final case class Event(event_id: Long, event_type: String, value: Double)

  /** (n, mean, M2) — Welford's online moments. */
  final case class ZState(n: Long, mean: Double, m2: Double) {
    def sd: Double = if (n < 2) 0.0 else math.sqrt(m2 / (n - 1))
    def add(x: Double): ZState = {
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      ZState(n1, mean1, m2 + d * (x - mean1))
    }
  }

  final case class Flagged(
      event_id: Long, event_type: String, value: Double,
      z: Double, n_prior: Long)

  /** Flag events whose |z| vs the group's running stats exceeds
    * `threshold`, once the group has seen at least `warmup` prior events.
    */
  def flagOutliers(events: Dataset[Event], threshold: Double = 3.0,
                   warmup: Long = 30): Dataset[Flagged] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[ZState, Flagged](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Event], state: GroupState[ZState]) =>
          var st = state.getOption.getOrElse(ZState(0L, 0.0, 0.0))
          val out = Seq.newBuilder[Flagged]
          // deterministic application order within the batch (see scaladoc)
          rows.toArray.sortBy(_.event_id).foreach { e =>
            val sd = st.sd
            if (st.n >= warmup && sd > 0.0) {
              val z = (e.value - st.mean) / sd
              if (math.abs(z) > threshold)
                out += Flagged(e.event_id, key, e.value, z, st.n)
            }
            st = st.add(e.value)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Batch-side reference for the spec tier: the flags [[flagOutliers]]
    * must produce on a bounded prefix, computed by the same fold without
    * any streaming machinery.
    */
  private[graft] def referenceFlags(events: Seq[Event], threshold: Double,
                                    warmup: Long): Seq[Flagged] =
    events.groupBy(_.event_type).toSeq.flatMap { case (k, es) =>
      var st = ZState(0L, 0.0, 0.0)
      es.sortBy(_.event_id).flatMap { e =>
        val sd = st.sd
        val f =
          if (st.n >= warmup && sd > 0.0) {
            val z = (e.value - st.mean) / sd
            if (math.abs(z) > threshold)
              Some(Flagged(e.event_id, k, e.value, z, st.n))
            else None
          } else None
        st = st.add(e.value)
        f
      }
    }.sortBy(_.event_id)
}
