package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming admission control for per-source sampling quotas — the
  * ingest-time twin of [[graft.ext.Curation.temperatureSample]]: a batch
  * mix computation ([[graft.ext.Curation.temperatureMix]] or
  * `domainMix`) fixes how many documents each source may contribute, and
  * the stream enforces those quotas AS DOCUMENTS ARRIVE, admitting until
  * each source's budget fills and dropping the rest. This is how a
  * crawl-fed corpus actually holds a target mixture: the mix is planned
  * offline on census data, but enforcement has to happen online, before
  * over-represented sources flood the lake.
  *
  * Admission is deterministic for a given arrival order: within a
  * micro-batch a source's rows admit in ascending `doc_id` order, across
  * batches in arrival order — so a replayed stream (same batches, same
  * order) admits the identical document set, which is what makes the
  * admitted corpus reproducible and the sink idempotent-friendly
  * (`n_admitted` is a per-source dense sequence usable as an
  * exactly-once key).
  *
  * Scale shape: state is ONE counter per source (a bounded frame no
  * matter the corpus — sources are thousands, not billions), the quota
  * table rides the closure (sources-sized, broadcast with the task
  * binary), and each micro-batch shuffles once on `source`. Skew note:
  * a single hot source funnels through one state partition; at crawl
  * scale pre-aggregate per (source, executor) admission candidates or
  * shard hot sources into sub-keys with sub-quotas.
  */
object QuotaAdmission {

  /** One document on the ingest stream. */
  case class Doc(doc_id: Long, source: String)

  /** An admitted document; `n_admitted` = the source's running admission
    * count AFTER this document (dense 1..quota per source). */
  case class Admitted(doc_id: Long, source: String, n_admitted: Long)

  /** Per-source admission counter kept in GroupState. */
  case class QuotaState(admitted: Long)

  /** Enforce `quotas` (source → max docs) over the document stream.
    * Sources absent from the map admit nothing — a curation pipeline
    * must OPT IN a source by giving it a budget, the fail-closed
    * default. */
  def admit(docs: Dataset[Doc], quotas: Map[String, Long]): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[QuotaState, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[Doc], state: GroupState2) =>
          val quota = quotas.getOrElse(src, 0L)
          var n = state.getOption.map(_.admitted).getOrElse(0L)
          // sort within the batch for replay determinism; bounded by the
          // micro-batch's per-source row count, not corpus size
          val admitted = Seq.newBuilder[Admitted]
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            if (n < quota) { n += 1; admitted += Admitted(d.doc_id, src, n) }
          }
          state.update(QuotaState(n))
          admitted.result().iterator
      }
  }

  private type GroupState2 = org.apache.spark.sql.streaming.GroupState[QuotaState]

  /** [[admit]] re-expressed on the `transformWithState` API (Spark 4's
    * arbitrary-stateful-processing successor to flatMapGroupsWithState):
    * identical admission semantics, state held in a named RocksDB-backed
    * `ValueState[Long]` per source. The new API is what a production
    * deployment targets — typed named state, TTL support, timers, and
    * state-schema evolution — so the engine ships both forms with a
    * parity spec pinning admitTws ≡ admit batch-for-batch. Requires the
    * RocksDB state-store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  class QuotaProcessor(quotas: Map[String, Long])
      extends StatefulProcessor[String, Doc, Admitted] {
    @transient private var admitted: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(src: String, rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Admitted] = {
      val quota = quotas.getOrElse(src, 0L)
      var n = if (admitted.exists()) admitted.get() else 0L
      val out = Seq.newBuilder[Admitted]
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        if (n < quota) { n += 1; out += Admitted(d.doc_id, src, n) }
      }
      admitted.update(n)
      out.result().iterator
    }
  }

  /** [[admit]] on the transformWithState API — see [[QuotaProcessor]]. */
  def admitTws(docs: Dataset[Doc], quotas: Map[String, Long]): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new QuotaProcessor(quotas),
        TimeMode.None(), OutputMode.Append())
  }
}
