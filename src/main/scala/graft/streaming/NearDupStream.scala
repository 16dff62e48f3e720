package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming NEAR-dup detection — the streaming twin of
  * [[graft.ext.Dedup.simhashPairs]], for the ingest-time curation a
  * training-data pipeline runs before documents ever land in the corpus.
  *
  * Shape: the 32-bit SimHash signature is computed PER ROW map-side (a
  * document's signature depends only on its own tokens, so no stream
  * aggregate is needed), exploded into the same [[graft.ext.Dedup
  * .HAMMING_BANDS]] pigeonhole bands as the batch operator, and bucketed
  * by (band, chunk) into `flatMapGroupsWithState`. Each bucket's state
  * holds the (doc_id, simhash, ts) triples seen within the event-time
  * horizon; an arriving document compares — full 32-bit Hamming verify —
  * only against its bucket cohort, exactly the batch candidate structure.
  * Pigeonhole makes banding lossless for Hamming ≤ bands−1, so within the
  * horizon the emitted pair set equals the batch operator's (modulo its
  * probe sampling).
  *
  * State is bounded two ways, both by the event-time watermark: entries
  * older than the watermark are evicted on every bucket visit, and an
  * event-time timeout clears buckets that stop receiving traffic.
  *
  * A pair that collides in several bands is emitted EXACTLY ONCE: only
  * the lowest colliding band emits, and "lowest colliding band" is a
  * pure function of the two signatures, so every bucket makes the same
  * call without coordination. (The batch operator pays a `distinct`
  * shuffle for the same property; a second stateful dedup downstream
  * would trip Spark's chained-stateful-operator watermark check.)
  */
object NearDupStream {

  /** One document on the stream. */
  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** A signature copy routed to one pigeonhole band bucket. */
  case class BandDoc(band: Int, chunk: Long, doc_id: Long, simhash: Long, ts: Timestamp)

  /** Bucket cohort entry retained in GroupState. */
  case class Seen(doc_id: Long, simhash: Long, tsMs: Long)

  /** A detected near-dup pair; `ts` is the LATER document's event time,
    * carried so downstream watermark-based pair dedup can evict. */
  case class NearDup(doc_a: Long, doc_b: Long, hamming: Int, ts: Timestamp)

  /** Per-document 32-bit SimHash, bit-identical to the batch SQL form in
    * [[graft.ext.Dedup.simhashSignatures]]: distinct whitespace tokens,
    * h = first 8 md5 hex chars as a 32-bit int, ±1 votes per bit,
    * bit j set iff the vote sum is strictly positive. The parity spec
    * pins this function against the batch aggregate. */
  private[streaming] def simhash32(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](32)
    // limit -1: keep trailing empty tokens, matching Spark SQL's split()
    text.split(" ", -1).distinct.foreach { tok =>
      val hex = md.digest(tok.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex, 16)
      var j = 0
      while (j < 32) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      md.reset()
    }
    (0 until 32).map(j => if (votes(j) > 0) 1L << j else 0L).sum
  }

  /** Band index [0, bands) of the FIRST band whose bit-chunks agree
    * between two signatures — the unique emitter for that pair. */
  private[streaming] def firstSharedBand(a: Long, b: Long, bands: Int): Int =
    (0 until bands).indexWhere { band =>
      val lo = 32 * band / bands
      val hi = 32 * (band + 1) / bands
      val mask = (1L << (hi - lo)) - 1
      ((a >> lo) & mask) == ((b >> lo) & mask)
    }

  /** Near-dup pairs over a document stream: every arriving document is
    * checked against the documents seen within the watermark horizon and
    * pairs at Hamming distance ≤ `maxHamming` (of 32) are emitted in
    * append mode, exactly once per pair (see object doc).
    *
    * `maxCohort` bounds the per-bucket state even against a viral
    * document repeated without pause inside the horizon (the streaming
    * analog of the batch operator's hot-bucket skew): when a bucket's
    * cohort exceeds the cap, the OLDEST entries are dropped first. The
    * recall cost is broader than the dropped entries alone: a pair's
    * unique emitter is its lowest shared band, so if THAT band's bucket
    * evicted one member, the pair is silenced even when both members
    * still co-reside in a higher shared band (the higher bucket stays
    * silent by design — it cannot know about the eviction without
    * cross-bucket coordination). A knob with a documented cost, not a
    * silent cap. At the default 10k a worst-case bucket holds ~160 KB
    * of (id, sig, ts) triples. */
  def nearDupSimhash(docs: Dataset[Doc], watermark: String = "30 minutes",
      maxHamming: Int = 8, maxCohort: Int = 10000): Dataset[NearDup] = {
    import docs.sparkSession.implicits._
    val bands = graft.ext.Dedup.HAMMING_BANDS
    require(maxHamming <= bands - 1,
      s"pigeonhole banding is only lossless for Hamming <= ${bands - 1}")
    // signature + band explosion BEFORE the watermark: a typed flatMap
    // drops the event-time tag, so the watermark must be (re)declared on
    // the banded frame that actually feeds the stateful operator
    docs
      .flatMap { d =>
        val sig = simhash32(d.text)
        (0 until bands).map { b =>
          val lo = 32 * b / bands
          val hi = 32 * (b + 1) / bands
          BandDoc(b, (sig >> lo) & ((1L << (hi - lo)) - 1), d.doc_id, sig, d.ts)
        }
      }
      .withWatermark("ts", watermark)
      .groupByKey(bd => (bd.band, bd.chunk))
      .flatMapGroupsWithState[List[Seen], NearDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), rows: Iterator[BandDoc], state: GroupState[List[Seen]]) =>
          val horizon = state.getCurrentWatermarkMs()
          val kept = state.getOption.getOrElse(Nil).filter(_.tsMs >= horizon)
          if (!rows.hasNext && state.hasTimedOut) {
            // bucket went quiet: drop expired entries, clear when empty
            if (kept.isEmpty) state.remove() else state.update(kept)
            Iterator.empty
          } else {
            val (bounded, out) =
              processArrivals(key._1, kept, rows.toSeq, maxHamming, maxCohort, bands)
            state.update(bounded)
            // let the timeout fire once the watermark passes the newest
            // entry — by then every entry is evictable
            state.setTimeoutTimestamp(bounded.map(_.tsMs).max + 1)
            out.iterator
          }
      }
  }

  /** The bucket-visit core shared VERBATIM by both stateful APIs
    * ([[nearDupSimhash]] on flatMapGroupsWithState, [[nearDupSimhashTws]]
    * on transformWithState) — parity between the two operators holds by
    * construction, and the parity spec then only has to witness it.
    *
    * Semantics (see [[nearDupSimhash]]'s doc for the full rationale):
    * arrivals process in deterministic (ts, doc_id) order; a re-ingested
    * unchanged signature is a no-op; a changed signature compares like a
    * fresh arrival; pairs emit only from the lowest shared band; entries
    * keep their NEWEST event time; the cohort cap drops oldest first. */
  private def processArrivals(band: Int, kept: List[Seen], rows: Seq[BandDoc],
      maxHamming: Int, maxCohort: Int, bands: Int): (List[Seen], Seq[NearDup]) = {
    // deterministic intra-batch order: a batch's own near-dups are
    // emitted exactly once, attributed to the later (ts, doc_id)
    val arrived = rows.sortBy(bd => (bd.ts.getTime, bd.doc_id))
    var cohort = kept
    val out = Seq.newBuilder[NearDup]
    arrived.foreach { bd =>
      // Re-ingest semantics (batch `distinct` parity): a doc_id
      // already in this cohort is removed before comparing, so the
      // bucket holds at most one entry per document and a pair can
      // be emitted at most once per bucket. An unchanged signature
      // is a pure re-ingest — no comparison at all; its pairs were
      // emitted on first arrival. A CHANGED signature is new
      // content and compares like a fresh arrival (entries the old
      // signature left in other-chunk buckets age out with the
      // watermark; until then the old content remains pairable,
      // the honest reading of "a version was in the corpus").
      val (prior, rest) = cohort.partition(_.doc_id == bd.doc_id)
      val reingest = prior.exists(_.simhash == bd.simhash)
      cohort = rest
      if (!reingest) {
        cohort.foreach { s =>
          val ham = java.lang.Long.bitCount(s.simhash ^ bd.simhash)
          // emit only from the lowest band the pair collides in —
          // the same pair in this bucket's higher band stays silent
          if (ham <= maxHamming
              && firstSharedBand(s.simhash, bd.simhash, bands) == band)
            out += NearDup(math.min(s.doc_id, bd.doc_id),
              math.max(s.doc_id, bd.doc_id), ham, bd.ts)
        }
      }
      // keep the NEWEST event time across arrivals (out-of-order
      // re-ingest must not shrink the entry's horizon lifetime)
      cohort ::= Seen(bd.doc_id, bd.simhash,
        (bd.ts.getTime +: prior.map(_.tsMs)).max)
    }
    // newest-first list: the cap drops the OLDEST entries
    val bounded = if (cohort.lengthCompare(maxCohort) > 0)
      cohort.take(maxCohort) else cohort
    (bounded, out.result())
  }

  /** Cohort state wrapper — transformWithState value states need a
    * product encoder. */
  case class Cohort(entries: Seq[Seen])

  /** [[nearDupSimhash]]'s bucket logic on the `transformWithState` API —
    * the production-deployment form (named RocksDB-backed state, typed
    * encoders, event-time timers, state-schema evolution), same pattern
    * as [[QuotaAdmission.admitTws]]. Watermark eviction happens on every
    * bucket visit AND on event-time timers registered past the newest
    * entry; stale timers from earlier batches re-fire harmlessly (the
    * eviction is idempotent). The comparison core is [[processArrivals]],
    * shared verbatim with the fMGWS form — the parity spec pins equal
    * output batch-for-batch. */
  class NearDupProcessor(maxHamming: Int, maxCohort: Int, bands: Int)
      extends StatefulProcessor[(Int, Long), BandDoc, NearDup] {
    @transient private var cohort: ValueState[Cohort] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cohort = getHandle.getValueState[Cohort]("cohort",
        Encoders.product[Cohort], TTLConfig.NONE)

    private def keptAsOf(horizonMs: Long): List[Seen] =
      (if (cohort.exists()) cohort.get().entries.toList else Nil)
        .filter(_.tsMs >= horizonMs)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandDoc],
        timerValues: TimerValues): Iterator[NearDup] = {
      val kept = keptAsOf(timerValues.getCurrentWatermarkInMs())
      val (bounded, out) =
        processArrivals(key._1, kept, rows.toSeq, maxHamming, maxCohort, bands)
      cohort.update(Cohort(bounded))
      getHandle.registerTimer(bounded.map(_.tsMs).max + 1)
      out.iterator
    }

    override def handleExpiredTimer(key: (Int, Long), timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[NearDup] = {
      val kept = keptAsOf(timerValues.getCurrentWatermarkInMs())
      if (kept.isEmpty) cohort.clear() else cohort.update(Cohort(kept))
      Iterator.empty
    }
  }

  /** [[nearDupSimhash]] on the transformWithState API — see
    * [[NearDupProcessor]]. Requires the RocksDB state-store provider. */
  def nearDupSimhashTws(docs: Dataset[Doc], watermark: String = "30 minutes",
      maxHamming: Int = 8, maxCohort: Int = 10000): Dataset[NearDup] = {
    import docs.sparkSession.implicits._
    val bands = graft.ext.Dedup.HAMMING_BANDS
    require(maxHamming <= bands - 1,
      s"pigeonhole banding is only lossless for Hamming <= ${bands - 1}")
    docs
      .flatMap { d =>
        val sig = simhash32(d.text)
        (0 until bands).map { b =>
          val lo = 32 * b / bands
          val hi = 32 * (b + 1) / bands
          BandDoc(b, (sig >> lo) & ((1L << (hi - lo)) - 1), d.doc_id, sig, d.ts)
        }
      }
      .withWatermark("ts", watermark)
      .groupByKey(bd => (bd.band, bd.chunk))
      .transformWithState(new NearDupProcessor(maxHamming, maxCohort, bands),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
