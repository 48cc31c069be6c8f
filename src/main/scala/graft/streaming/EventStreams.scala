package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Typed event row for the stateful operators. */
case class SEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                  event_type: String, value: Double)

/** Running per-user aggregate state. */
case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** Open-session state for [[EventStreams.customSessions]]. */
case class SessionState(start: Long, end: Long, n_events: Long)

/** A closed session emitted by [[EventStreams.customSessions]]. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long)

/** One buffered above-watermark event for [[EventStreams.transitionHops]]. */
case class BufEv(ts_us: Long, event_id: Long, event_type: String)

/** Per-user hop-extraction state: the last FINALIZED event plus the
  * buffer of events still above the watermark (horizon-bounded). */
case class HopState(last_ts_us: Long, last_type: String, buf: List[BufEv])

/** An emitted (prev → next) event-type hop with its gap in µs. */
case class Hop(user_id: Long, prev_type: String, next_type: String,
               gap_us: Long)

/** Per-shard packer state for
  * [[EventStreams.trainingPipelineStream]] — two longs per shard. */
case class PackState(nextPos: Long, cumToks: Long)

/** One packed training row (the
  * [[graft.ops.Curation.trainingAssemblyStable]] row shape). */
case class TrainRow(doc_id: Long, shard: Int, pos_in_shard: Long,
                    chunk: Long, n_toks: Long, quality: Double)

/** Structured Streaming forms of the event-time operators (SURVEY.md
  * §2.2 streaming-only rows). The batch queries in `ops.Events` use the
  * same `groupBy(window(...))` shapes; these add watermarks (bounded
  * state, late-data drop) and the streaming-native session operator.
  *
  * All take an unbounded DataFrame with at least
  * `(event_id long, ts timestamp, user_id long, event_type string,
  * value double)` — e.g. a `MemoryStream` in tests, or
  * `spark.readStream.format("kafka")...` in production. State size is
  * bounded by the watermark horizon; nothing accumulates on the driver.
  */
object EventStreams {

  /** 1-hour tumbling counts per event_type; late rows beyond the
    * watermark are dropped (never double-counted). */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sv"))

  /** 1-hour windows sliding every 30 minutes. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(col("window.start").as("ws"), col("n"), col("sv"))

  /** 30-minute-gap session windows per user — the streaming-native
    * `session_window` counterpart of the batch gaps-and-islands query
    * (ops.Events.qStreamSession). */
  def sessionAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  /** Stateful streaming dedup by event_id with bounded state: the
    * watermark lets Spark evict seen-keys older than the horizon. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming CONTENT-hash dedup of documents — the LLM-pipeline form
    * of [[graft.ops.Dedup.qDedupExact]] for an unbounded crawl stream:
    * only the first occurrence of each sha256(text) within the
    * watermark horizon is emitted; re-crawled bodies are dropped
    * regardless of their doc_id. State is the seen-hash set, bounded
    * by the watermark (a duplicate arriving after its first
    * occurrence's state is evicted is re-admitted — the bounded-state
    * tradeoff every streaming dedup makes; at 100 TB/day an unbounded
    * seen-set cannot exist, so the horizon IS the contract).
    * Input needs (text string, ts timestamp) at minimum. */
  def dedupDocsByContent(docs: DataFrame,
                         watermark: String = "10 minutes"): DataFrame =
    contentDedupStage(docs.withWatermark("ts", watermark))

  /** [[dedupDocsByContent]] minus the watermark application — the
    * composition form (a stream may declare its watermark only ONCE,
    * so [[crawlTriadStream]] sets it at the source and chains the
    * bare stages). */
  private def contentDedupStage(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", sha2(col("text"), 256))
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming URL-keyed dedup — the frontier-side twin of
    * [[dedupDocsByContent]]: canonicalize each arriving URL (the
    * [[graft.ops.Url]] narrow expression chain, stateless) and keep
    * only the first occurrence of each CANONICAL form within the
    * watermark horizon, so re-crawls and tracking-param variants of a
    * page are dropped before its body is ever fetched/processed.
    * State is the seen-canon set, watermark-bounded (same contract as
    * the content dedup). Input needs (url string, ts timestamp). */
  def dedupUrlStream(rows: DataFrame,
                     watermark: String = "10 minutes"): DataFrame =
    urlDedupStage(rows.withWatermark("ts", watermark))

  /** [[dedupUrlStream]] minus the watermark (see
    * [[contentDedupStage]]). */
  private def urlDedupStage(rows: DataFrame): DataFrame =
    rows
      .withColumn("canon", graft.ops.Url.canonCol(col("url")))
      .dropDuplicatesWithinWatermark("canon")

  /** Streaming corpus curation — the incremental form of the batch
    * [[graft.ops.TextAnalysis.curate]] pipeline for an unbounded crawl
    * stream: content-hash dedup within the watermark horizon
    * ([[dedupDocsByContent]]'s state contract), then the quality gate
    * (length/TTR/stopword-free composite, same formula as the batch
    * op) and the Gopher repetition gate — both PURE NARROW projections,
    * so the only streaming state in the whole pipeline is the bounded
    * seen-hash set. Rows emitted are curated documents ready for the
    * shard writer; at 100 TB/day this runs as one stage after the
    * dedup state store. Input needs (doc_id, text, ts). */
  def curateStream(docs: DataFrame, watermark: String = "10 minutes",
                   minQuality: Double = 0.5,
                   maxDupTokFrac: Double = 0.6): DataFrame =
    curateStreamRows(docs, watermark, minQuality, maxDupTokFrac)
      .select("doc_id", "ts", "n_toks", "quality", "dup_tok_frac")

  /** [[curateStream]] WITH the token column still attached — the
    * composition form ([[crawlTriadStream]] feeds the survivors'
    * tokens straight into the near-dup band probe without
    * re-tokenizing or joining the text back). */
  private[graft] def curateStreamRows(docs: DataFrame, watermark: String,
                                      minQuality: Double,
                                      maxDupTokFrac: Double): DataFrame =
    curateRowsStage(docs.withWatermark("ts", watermark),
                    minQuality, maxDupTokFrac)

  /** [[curateStreamRows]] minus the watermark (see
    * [[contentDedupStage]]). The gate itself is the SHARED
    * [[graft.ops.TextAnalysis.qualityGate]] — one definition for the
    * stream and the batch triad, so parity cannot drift. */
  private def curateRowsStage(docs: DataFrame, minQuality: Double,
                              maxDupTokFrac: Double): DataFrame =
    graft.ops.TextAnalysis.qualityGate(
      contentDedupStage(docs)
        .withColumn("toks", split(lower(trim(col("text"))), "\\s+")),
      minQuality, maxDupTokFrac)

  /** [[curateStream]] fed from RAW HTML pages (doc_id, html, ts) —
    * the full incremental crawl pipeline: markup strip
    * ([[graft.ops.Html]], a stateless narrow projection that adds no
    * state to the stream) composed in front of the stateful
    * content-hash dedup + quality gates. What a production crawl
    * ingests: pages in, curated docs out, exactly-once under the same
    * watermark contract as curateStream. */
  def curateWebStream(pages: DataFrame, watermark: String = "10 minutes",
                      minQuality: Double = 0.5,
                      maxDupTokFrac: Double = 0.6): DataFrame =
    curateStream(
      pages.select(col("doc_id"),
                   graft.ops.Html.contentColumn(col("html")).as("text"),
                   col("ts")),
      watermark, minQuality, maxDupTokFrac)

  /** Incremental DSIR scoring: score a document stream (doc_id, text,
    * ts) against a BATCH-built [[graft.ops.Curation.dsirModel]] —
    * (doc_id, ts, n_feats, dsir_w). A pure stateless projection (one
    * map-literal lookup per hashed feature): no aggregation state, no
    * watermark requirement, append-safe — the scoring half of the
    * batch estimator split exactly where a production pipeline splits
    * it (model refit is a periodic batch job; the stream only reads
    * the artifact). */
  def dsirScoreStream(docs: DataFrame, model: Map[String, Double],
                      default: Double, buckets: Int = 4096): DataFrame =
    // tokenize via the SAME facade expression the model was built
    // through (Graft.dsirModel) — a hand-copied tokenizer here could
    // silently drift from the model's feature distribution
    graft.ops.Curation.dsirScoreCols(
      graft.Graft.tokenize(docs), model, default, buckets)
      .select("doc_id", "ts", "n_feats", "dsir_w")

  /** Stream-stream INTERVAL join: each purchase joined to signups of
    * the same user within the preceding `horizon` — the canonical
    * Structured Streaming join shape. Both sides carry watermarks and
    * the join condition bounds s_ts to [p_ts - horizon, p_ts], which
    * is what lets Spark EVICT join state once the watermark passes the
    * bound (an unbounded stream-stream equi-join would buffer both
    * streams forever; the interval is the state contract, exactly like
    * the dedup horizon). `LeftOuter` additionally emits an unmatched
    * purchase with a null signup once its window is provably closed
    * (watermark past p_ts + horizon slack) — never speculatively. */
  def purchaseSignupJoin(purchases: DataFrame, signups: DataFrame,
                         watermark: String = "10 minutes",
                         horizon: String = "1 hour",
                         joinType: String = "inner"): DataFrame = {
    val p = purchases
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val s = signups
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", watermark)
    p.join(s,
      col("user_id") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"),
      joinType)
      .select("event_id", "user_id", "p_ts", "s_ts")
  }

  /** Fully custom sessionization via `flatMapGroupsWithState` with an
    * EVENT-TIME TIMEOUT — the arbitrary-state API at full power, where
    * `session_window` ([[sessionAgg]]) is the declarative shortcut:
    * per-user open-session state extends while events arrive within
    * `gap`; a session is EMITTED only when the watermark passes its
    * end + gap (the timeout callback proves no in-order event can
    * extend it), so output is append-correct and state is bounded by
    * the number of open sessions. An event landing past the gap
    * closes the open session in the same callback and starts a new
    * one. */
  def customSessions(events: Dataset[SEvent],
                     watermark: String = "10 minutes",
                     gapMinutes: Int = 30): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[SEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the session is provably closed
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(
              uid, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n_events))
          } else {
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t),
                                          s.n_events + 1))
                case Some(s) => // gap exceeded inside the batch: close it
                  closed ::= ClosedSession(
                    uid, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n_events)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming (prev → next) hop extraction — the incremental feed for
    * the batch transition matrix ([[graft.ops.Events.transitions]]):
    * per-user ordered hops with µs gaps, emitted APPEND-CORRECTLY.
    * A hop is emitted only once its LATER endpoint falls at or below
    * the watermark — the proof no earlier in-order event can still
    * arrive between the two — so late data within the horizon lands
    * in the right sequence position instead of corrupting hop order
    * (the naive arrival-order version interleaves wrongly across
    * micro-batches). Events above the watermark wait in per-user
    * state; an event-time timeout flushes them as the watermark
    * passes, even if the user never sends another event. State =
    * one finalized event + the horizon-bounded buffer per ACTIVE
    * user: a user idle past `idleTtlMs` (watermark time) has its
    * entry removed entirely, so the store is bounded by active users,
    * not by every user_id ever seen — the price is that a hop
    * SPANNING an expiry gap is dropped (its prev endpoint is gone),
    * the documented trade for bounded state on an unbounded id
    * space. The 25-row matrix itself is then
    * `hops.groupBy(prev, next)` in update mode — aggregation
    * composes downstream, as with [[streamingHeavyHitters]]. */
  def transitionHops(events: Dataset[SEvent],
                     watermark: String = "10 minutes",
                     idleTtlMs: Long = 7L * 24 * 3600 * 1000): Dataset[Hop] = {
    import events.sparkSession.implicits._
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def flush(uid: Long, st: HopState, wmUs: Long,
              incoming: List[BufEv],
              state: GroupState[HopState]): Iterator[Hop] = {
      val all = (st.buf ++ incoming).sortBy(b => (b.ts_us, b.event_id))
      val (ready, pending) = all.partition(_.ts_us <= wmUs)
      var lastTs = st.last_ts_us
      var lastType = st.last_type
      val hops = ready.flatMap { b =>
        val h = Option(lastType)
          .map(p => Hop(uid, p, b.event_type, b.ts_us - lastTs))
        lastTs = b.ts_us; lastType = b.event_type
        h
      }
      if (ready.isEmpty && pending.isEmpty && incoming.isEmpty &&
          lastType != null && wmUs >= lastTs + idleTtlMs * 1000L) {
        // idle-expiry timeout: nothing buffered, nothing new, and the
        // watermark is a full TTL past the last event — drop the user
        state.remove()
        Iterator.empty
      } else {
        state.update(HopState(lastTs, lastType, pending))
        if (pending.nonEmpty)
          // fire when the watermark passes the OLDEST pending event so
          // it flushes promptly even if this user goes quiet
          state.setTimeoutTimestamp(pending.map(_.ts_us).min / 1000L + 1L)
        else if (lastType != null)
          // nothing pending: arm the idle-expiry alarm (clamped above
          // the current watermark — required by the state API)
          state.setTimeoutTimestamp(
            math.max(lastTs / 1000L + idleTtlMs, wmUs / 1000L + 1L))
        hops.iterator
      }
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[HopState, Hop](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[SEvent], state: GroupState[HopState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(HopState(Long.MinValue, null, Nil))
          val incoming =
            batch.map(e => BufEv(micros(e.ts), e.event_id, e.event_type)).toList
          flush(uid, st, wmUs, incoming, state)
      }
  }

  /** The Spark 4 `transformWithState` form of [[runningUserTotals]] —
    * the current-generation arbitrary-state API (StatefulProcessor +
    * typed `ValueState` handles, RocksDB-backed state store, TTL-able,
    * multiple state variables per key). Functionally identical output
    * to the classic `mapGroupsWithState` twin; StreamingSpec asserts
    * the parity. */
  def runningUserTotalsTws(events: Dataset[SEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
                          TimeMode.None(), OutputMode.Update())
  }

  /** Custom per-key state via `mapGroupsWithState` (the arbitrary-state
    * extension point, SURVEY.md §2.2): running per-user event count and
    * value total, updated each micro-batch. State lives in the state
    * store (checkpointable, executor-side) — nothing on the driver.
    * Emit in `update` output mode.
    */
  def runningUserTotals(events: Dataset[SEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[SEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          batch.foreach { e => n += 1; tot += e.value }
          val cur = UserTotals(uid, n, tot)
          state.update(cur)
          cur
      }
  }

  /** Streaming NEAR-dup probe — the stream form of
    * [[graft.ops.Dedup.incrementalNearDup]], closing the crawl-dedup
    * triad (URL dedup → content-hash dedup → near-dup) for an
    * unbounded stream: each arriving (doc_id, ts, toks) document is
    * MinHash-signed and LSH-banded with the SAME expression pipeline
    * as the batch index build, probed against the corpus's
    * MATERIALIZED band table (a stream-static equi-join — stateless;
    * at rest the band table is bucketed by (band, bkey) so the probe
    * shuffles only the stream side), and band-collision candidates are
    * verified with the exact merge-scan Jaccard against the corpus
    * shingle table (second stream-static join, candidate-scale).
    *
    * The shingle array rides WITH the stream through its band rows —
    * the batch build deliberately avoids that (the r2 12× payload
    * lesson), but here the banded side is a MICRO-BATCH of the stream,
    * not the corpus: bands× a batch-bounded payload against zero extra
    * joins is the right trade, and the corpus-scale tables are never
    * reshaped at all. The only streaming STATE is the final
    * (doc_id, corpus_id) dedup of multi-band collisions, bounded by
    * the watermark horizon ([[dedupWithinWatermark]]'s contract).
    * Emits (doc_id, ts, corpus_id, jac ≥ tau). */
  def nearDupProbeStream(docs: DataFrame, corpusShingles: DataFrame,
                         corpusBands: DataFrame, tau: Double = 0.8,
                         bands: Int = graft.ops.Dedup.Bands,
                         watermark: String = "10 minutes"): DataFrame =
    nearDupProbeStage(docs.withWatermark("ts", watermark),
                      corpusShingles, corpusBands, tau, bands)

  /** [[nearDupProbeStream]] minus the watermark (see
    * [[contentDedupStage]]). */
  private def nearDupProbeStage(docs: DataFrame, corpusShingles: DataFrame,
                                corpusBands: DataFrame, tau: Double,
                                bands: Int): DataFrame = {
    import graft.ops.Dedup
    val spark = docs.sparkSession
    graft.functions.SetFunctions.register(
      spark, Dedup.permA, Dedup.permB, Dedup.MersennePrime)
    val rowsPerBand = Dedup.MinhashK / bands
    val banded = docs
      .select(col("doc_id"), col("ts"),
              Dedup.shingleHashes(col("toks")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Dedup.minhashSig(col("sh")))
      .select(col("doc_id"), col("ts"), col("sh"), col("sig"),
              explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("doc_id"), col("ts"), col("sh"), col("band"),
              Dedup.bandKey(col("sig"), col("band"), rowsPerBand).as("bkey"))
    banded
      .join(corpusBands.select(col("band"), col("bkey"),
                               col("doc_id").as("corpus_id")),
            Seq("band", "bkey"))
      .join(corpusShingles.select(col("doc_id").as("corpus_id"),
                                  col("sh").as("sh_c")),
            "corpus_id")
      .withColumn("inter",
        graft.functions.SetFunctions.sortedIntersectSize(col("sh"), col("sh_c")))
      .select(col("doc_id"), col("ts"), col("corpus_id"),
              (col("inter").cast("double")
                / (size(col("sh")) + size(col("sh_c")) - col("inter"))).as("jac"))
      .filter(col("jac") >= tau)
      .select(col("doc_id"), col("ts"), col("corpus_id"),
              round(col("jac"), 6).as("jac"))
      .dropDuplicatesWithinWatermark("doc_id", "corpus_id")
  }

  /** The COMPOSED incremental crawl triad (r13 — VERDICT r12 #6):
    * `dedupUrlStream` → `curateWebStream` → `nearDupProbeStream` as
    * ONE streaming query — pages in (doc_id, url, html, ts), corpus
    * near-dup HITS out (doc_id, ts, corpus_id, jac): the quarantine
    * stream a crawl pipeline routes away from the shard writer (the
    * kept stream is the same pipeline's curated complement; emitting
    * the hits keeps the query append-mode pure).
    *
    * Exactly three stateful operators, each watermark-bounded:
    *  1. the seen-canonical-URL set (re-crawls/tracking variants die
    *     before their body is processed),
    *  2. the seen-content-hash set (keyed on EXTRACTED content, so
    *     markup-chrome variants die here),
    *  3. the (doc_id, corpus_id) multi-band collision dedup.
    * Everything between is a stateless narrow projection (canon,
    * markup strip, quality gates, shingle/minhash/band keys) or a
    * stream-static join against the MATERIALIZED band index — the
    * corpus-scale tables are never reshaped by the stream. Stream ≡
    * the batch pipeline (canon-first → extract → hash-dedup + gates →
    * incrementalNearDup) on a replayed corpus — StreamingSpec. */
  def crawlTriadStream(pages: DataFrame, corpusShingles: DataFrame,
                       corpusBands: DataFrame, tau: Double = 0.8,
                       watermark: String = "10 minutes",
                       minQuality: Double = 0.5,
                       maxDupTokFrac: Double = 0.6): DataFrame = {
    // the watermark is declared ONCE at the source (Spark forbids
    // redefining it mid-stream); the bare stages chain behind it
    val fresh = urlDedupStage(pages.withWatermark("ts", watermark))
      .select(col("doc_id"),
              graft.ops.Html.contentColumn(col("html")).as("text"),
              col("ts"))
    val curated = curateRowsStage(fresh, minQuality, maxDupTokFrac)
      .select(col("doc_id"), col("ts"), col("toks"))
    nearDupProbeStage(curated, corpusShingles, corpusBands, tau,
                      graft.ops.Dedup.Bands)
  }

  /** Streaming training assembly — the incremental form of
    * [[graft.ops.Curation.trainingAssemblyStable]] (r14, verdict ask
    * #6): an unbounded curated-document stream packed into training
    * shards/chunks as it arrives.
    *
    * Stage contract, stream ≡ batch (StreamingSpec pins parity on a
    * replayed corpus):
    *  1. incremental dedup keeper — the watermark-bounded
    *     seen-content-hash state ([[contentDedupStage]]);
    *  2. the SHARED quality gate
    *     ([[graft.ops.TextAnalysis.qualityGate]] — same definition
    *     batch runs, a stateless projection);
    *  3. STABLE shard assignment ([[graft.ops.Curation.stableShard]]
    *     — a pure (salt, doc_id) hash, so an appended document never
    *     moves an already-assigned one; the batch pipeline's global
    *     md5 permutation deliberately lacks this property, which is
    *     exactly why the stable twin exists);
    *  4. per-shard chunk packing as a stateful operator:
    *     `flatMapGroupsWithState` keyed by shard, whose entire state
    *     is (next position, cumulative tokens) — two longs PER SHARD,
    *     bounded by construction, nothing watermark-dependent. Rows
    *     within a micro-batch group are folded in doc_id order so the
    *     packing is deterministic and equals the batch twin's
    *     doc_id-order fold when waves arrive id-ordered.
    * Emits (doc_id, shard, pos_in_shard, chunk, n_toks, quality) —
    * the batch twin's exact row shape. */
  def trainingPipelineStream(docs: DataFrame, shards: Int = 8,
                             budget: Long = 2048,
                             minQuality: Double = 0.5,
                             maxDupTokFrac: Double = 0.6,
                             salt: String = "r12",
                             watermark: String = "10 minutes"): Dataset[TrainRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fresh = contentDedupStage(docs.withWatermark("ts", watermark))
    val gated = graft.ops.TextAnalysis.qualityGate(
        fresh.withColumn("toks", split(lower(trim(col("text"))), "\\s+")),
        minQuality, maxDupTokFrac)
      .select(col("doc_id").cast("long").as("doc_id"),
              col("n_toks").cast("long").as("n_toks"), col("quality"),
              graft.ops.Curation.stableShard(col("doc_id"), salt, shards)
                .as("shard"))
      .as[(Long, Long, Double, Int)]
    gated.groupByKey(_._4)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[(Long, Long, Double, Int)],
         state: GroupState[PackState]) => {
          var st = state.getOption.getOrElse(PackState(0L, 0L))
          // doc_id-order fold inside the micro-batch: group iteration
          // order is otherwise partition-arbitrary
          val out = rows.toSeq.sortBy(_._1).map {
            case (docId, nToks, quality, _) =>
              val row = TrainRow(docId, shard, st.nextPos,
                                 st.cumToks / budget, nToks, quality)
              st = PackState(st.nextPos + 1, st.cumToks + nToks)
              row
          }
          state.update(st)
          out.iterator
        })
  }

  /** Stream-static enrichment join: an unbounded event stream joined
    * to a bounded dimension DataFrame. STATE-FREE — the static side is
    * (re)read per micro-batch and broadcast when under the threshold;
    * no watermark needed because nothing buffers. The everyday shape
    * for attaching user/document attributes to a live stream; the
    * batch-side twin is any `ops.Relational` dim join. */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming heavy hitters over an unbounded token stream — the
    * incremental form of [[graft.ops.TextAnalysis.heavyHitters]]:
    * tokens are hash-sharded into `buckets` state keys, each holding a
    * k-counter Misra–Gries summary in `mapGroupsWithState`
    * (state = `buckets` maps of ≤ k counters, FIXED size forever —
    * the only admissible state contract for an unbounded vocabulary).
    *
    * The per-bucket guarantee composes to the global one: a token
    * always lands in the same bucket, and its bucket's sub-stream
    * length N_b ≤ N, so any token with global frequency f > N/(k+1)
    * has f > N_b/(k+1) in its own bucket and survives that bucket's
    * MG summary. Sharding therefore splits state and load `buckets`
    * ways WITHOUT weakening the bound. Each trigger emits every
    * bucket's current candidates (update mode); readers union the
    * buckets and (as in the batch op) recount candidates exactly if
    * they need exact figures.
    */
  def streamingHeavyHitters(toks: Dataset[String], k: Int = 50,
                            buckets: Int = 32): Dataset[HHBucket] = {
    import toks.sparkSession.implicits._
    val mg = new graft.functions.MisraGriesAggregator(k)
    toks
      .groupByKey(t => math.floorMod(t.hashCode, buckets))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (bucket: Int, batch: Iterator[String], state: GroupState[HHBucket]) =>
          val prev = state.getOption.map(_.items).getOrElse(mg.zero)
          val cur = HHBucket(bucket, batch.foldLeft(prev)(mg.reduce))
          state.update(cur)
          cur
      }
  }
}

/** One hash shard's current Misra–Gries candidates
  * ([[EventStreams.streamingHeavyHitters]]). */
case class HHBucket(bucket: Int, items: Map[String, Long])

/** StatefulProcessor for [[EventStreams.runningUserTotalsTws]]: one
  * typed ValueState per user holding the running totals. Top-level
  * class — the processor is serialized to executors. */
class RunningTotalsProcessor extends StatefulProcessor[Long, SEvent, UserTotals] {
  @transient private var totals: ValueState[UserTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserTotals](
      "totals", Encoders.product[UserTotals], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[SEvent],
                               timerValues: TimerValues): Iterator[UserTotals] = {
    val prev =
      if (totals.exists()) totals.get() else UserTotals(key, 0L, 0.0)
    var n = prev.n_events
    var tot = prev.total_value
    rows.foreach { e => n += 1; tot += e.value }
    val cur = UserTotals(key, n, tot)
    totals.update(cur)
    Iterator.single(cur)
  }
}
