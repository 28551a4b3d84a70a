package graft

/** Parser for the PREVIOUS round's bench artifact (`BENCH_r<N>.json`) —
  * what [[Bench]] seeds its probe estimates and CV-adjudication
  * references from. Extracted from Bench.main so the three artifact
  * shapes it must survive are spec-pinned ([[graft.BenchArtifactsSpec]]):
  *
  *  1. a RAW multi-line bench log (local runs): metric lines, the last
  *     `detail` + `summary` pair wins;
  *  2. a DRIVER-WRAPPED artifact (`{"n":…, "rc":…, "tail":"<escaped
  *     bounded output suffix>"}`): the tail is decoded and treated as
  *     (1) — the regexes must run on the DECODED tail, never the raw
  *     file, or every key is quote-escaped out of reach;
  *  3. a FRONT-TRUNCATED wrapped tail (r14's failure shape: the summary
  *     line started before the tail window, so no parseable object
  *     start survives) — a regex fallback still recovers `probe_secs`
  *     and the CV adjudication scalars from the fragment.
  *
  * An artifact at a DIFFERENT scale factor is ignored entirely: a local
  * sf0.001 smoke run must not burn retries against the driver's sf0.1
  * numbers, and vice versa.
  */
private[graft] object BenchArtifacts {

  /** Everything Bench reads from the previous round's artifact:
    * `bench` — adjudication scalars (off-band probe values re-measure
    * against these), `probeSecs` — measured wall per probe (seeds this
    * run's budget estimates), `skipped` — probes the previous run
    * budget-skipped (they get priority ordering this run, so no probe is
    * a PERMANENT skip victim), `loadedBox` — whether the previous run
    * self-reported contamination (its measured probe_secs then get a
    * haircut instead of inflating this run's estimates forever). */
  final case class Prev(bench: Map[String, Double],
      probeSecs: Map[String, Double], skipped: Set[String],
      loadedBox: Boolean)

  val Empty: Prev = Prev(Map.empty, Map.empty, Set.empty, loadedBox = false)

  /** Parsed previous artifact from the newest `BENCH_r*.json` under
    * `dir`; [[Empty]] when none matches `sfDir`. */
  def parsePrev(dir: java.io.File, sfDir: String): Prev = {
    val re = """BENCH_r(\d+)\.json""".r
    val newest = Option(dir.listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case re(n) => Some((n.toInt, f))
        case _ => None
      }).sortBy(-_._1).headOption.map(_._2)
    newest.map { f =>
      val raw = try java.nio.file.Files.readString(f.toPath)
        catch { case _: Throwable => "" }
      parseArtifact(raw, sfDir)
    }.getOrElse(Empty)
  }

  /** Same, over artifact CONTENT (the spec seam). */
  def parseArtifact(raw: String, sfDir: String): Prev = {
    val adjudicationKeys = Seq("cv_ingest_events_per_sec",
      "cv_large_state_sec", "cv_soak_events_per_sec",
      "gate_pushdown_100k_ev_s", "gate_events_per_sec",
      "ndgate_events_per_sec")
    // a REAL JSON parse (Jackson rides the Spark jars) where a complete
    // line/object exists
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def parse(s: String): Option[com.fasterxml.jackson.databind.JsonNode] =
      try Option(om.readTree(s)) catch { case _: Throwable => None }
    // decode shape: raw metric lines, or a wrapped tail, or a bare blob
    val lines = raw.linesIterator.filter(_.startsWith("{\"metric\"")).toSeq
    val (text: Seq[String], fallbackText: String) =
      if (lines.nonEmpty) (lines, raw)
      else parse(raw) match {
        case Some(n) if n.has("tail") =>
          val t = n.get("tail").asText()
          (Seq(t), t)
        case _ => (Seq(raw), raw)
      }
    // the artifact is two-line from r15 on (a bulky "detail" line, then
    // the compact "summary" line): take the LAST of each and merge,
    // summary winning — one logical field map however the split falls
    def lastOf(marker: String) = {
      val joined = text.mkString("\n")
      val i = joined.lastIndexOf(marker)
      if (i < 0) None else parse(joined.substring(i))
    }
    val merged = scala.collection.mutable.Map[String, Double]()
    var probeMap = Map.empty[String, Double]
    var skipped = Set.empty[String]
    var loaded = false
    var sfOk = false
    var parsedAny = false
    Seq("{\"metric\":\"detail\"", "{\"metric\":\"summary\"").foreach { m =>
      lastOf(m).foreach { n =>
        parsedAny = true
        if (n.path("sf").asText() == sfDir) sfOk = true
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isNumber)
            merged(e.getKey) = e.getValue.asDouble()
        }
        if (n.path("loaded_box").isBoolean)
          loaded = n.path("loaded_box").asBoolean()
        val sk = n.path("probes_skipped")
        if (sk.isTextual)
          skipped = sk.asText().split(",").map(_.trim)
            .filter(_.nonEmpty).toSet
        val ps = n.path("probe_secs")
        if (ps.isObject) {
          val pit = ps.fields()
          val b = Map.newBuilder[String, Double]
          while (pit.hasNext) {
            val e = pit.next()
            if (e.getValue.isNumber) b += (e.getKey -> e.getValue.asDouble())
          }
          probeMap = b.result()
        }
      }
    }
    // regex fallback for a FRONT-TRUNCATED tail: no parseable object
    // start survives, but the probe_secs object itself does
    if (probeMap.isEmpty && fallbackText.contains("\"sf\":\"" + sfDir + "\"")) {
      sfOk = true
      val psRe = """"probe_secs":\{([^{}]*)\}""".r
      val kvRe = """"([a-z0-9_]+)":([0-9.]+)""".r
      psRe.findFirstMatchIn(fallbackText).foreach { m =>
        probeMap = kvRe.findAllMatchIn(m.group(1))
          .map(g => g.group(1) -> g.group(2).toDouble).toMap
      }
      adjudicationKeys.foreach { k =>
        kvRe.findAllMatchIn(fallbackText)
          .find(_.group(1) == k)
          .foreach(g => merged(k) = g.group(2).toDouble)
      }
      // the regex scan sees the WHOLE raw log, where early emissions may
      // carry values the final summary superseded — only fill fields the
      // JSON parse produced nothing for, and take the LAST occurrence
      // (matching the lastOf semantics of the line parse)
      if (!parsedAny) {
        """"probes_skipped":"([^"]*)"""".r.findAllMatchIn(fallbackText)
          .toSeq.lastOption
          .foreach(m => skipped = m.group(1).split(",").map(_.trim)
            .filter(_.nonEmpty).toSet)
        """"loaded_box":(true|false)""".r.findAllMatchIn(fallbackText)
          .toSeq.lastOption
          .foreach(m => loaded = m.group(1).toBoolean)
      }
    }
    // only adjudicate/seed from an artifact at the SAME scale factor
    if (!sfOk) Empty
    else Prev(adjudicationKeys
      .flatMap(k => merged.get(k).filter(_ > 0).map(k -> _)).toMap,
      probeMap, skipped, loaded)
  }
}
