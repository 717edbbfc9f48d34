package graft.functions

/** Deterministic natural-language date grammar — the engine-side replacement
  * of the reference's `dateparser.search_dates` calls
  * (src/methods/DateParser.py:45, Spanish variant at
  * src/methods/MultipleEntityExtractor.py:61-63). Pure function → usable
  * from column pipelines (UDF) or typed maps; no locale lookups, no wall
  * clock.
  *
  * Grammar boundary — a stated contract, not an accident (the deterministic
  * subset of `dateparser`; DatesSpec "deliberately-uncovered shapes"):
  *
  * | shape                      | example               | covered |
  * |----------------------------|-----------------------|---------|
  * | ISO                        | 2021-03-09            | yes     |
  * | D/M/Y, D.M.Y (4-digit yr)  | 09/03/2021            | yes     |
  * | D Month Y (en)             | 9 March 2021          | yes     |
  * | Month D, Y (en)            | March 9, 2021         | yes     |
  * | D de mes de Y (es)         | 9 de marzo de 2021    | yes     |
  * | relative (en/es)           | two weeks ago /       | NO      |
  * |                            | hace dos semanas      |         |
  * | bare year                  | 2021                  | NO      |
  * | month-year                 | March 2021            | NO      |
  * | day-month, no year         | 12 January            | NO      |
  * | 2-digit year               | 01/02/21              | NO      |
  * | weekday phrases            | last Tuesday          | NO      |
  *
  * Relative/underspecified shapes require a reference clock ("now") —
  * exactly what a deterministic, replayable engine must not consult; the
  * reference's `dateparser.search_dates` resolves them against wall time,
  * producing run-dependent output. Uncovered shapes parse to None and are
  * dropped by the F4 parse-success filter.
  */
object Dates {

  private val monthNames: Map[String, Int] = {
    val en = Seq("january", "february", "march", "april", "may", "june", "july",
      "august", "september", "october", "november", "december")
    val es = Seq("enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
      "agosto", "septiembre", "octubre", "noviembre", "diciembre")
    (en.zipWithIndex ++ es.zipWithIndex).map { case (n, i) => n -> (i + 1) }.toMap
  }

  private val Iso = """(\d{4})-(\d{2})-(\d{2})""".r
  private val Dmy = """(\d{1,2})[/.](\d{1,2})[/.](\d{4})""".r
  private val DMonY = """(\d{1,2})(?: de)? ([a-záéíóúñ]+)(?: de)?,? (\d{4})""".r
  private val MonDY = """([a-záéíóúñ]+) (\d{1,2}),? (\d{4})""".r

  /** Parse one date expression; None when the grammar doesn't match or the
    * field values are out of range (mirrors the parse-success filter F4).
    */
  def parse(s: String): Option[java.time.LocalDate] = {
    val t = Text.normWs(s).toLowerCase(java.util.Locale.ROOT)
    val parsed = t match {
      case Iso(y, m, d)    => Some((y.toInt, m.toInt, d.toInt))
      case Dmy(d, m, y)    => Some((y.toInt, m.toInt, d.toInt))
      case DMonY(d, mn, y) => monthNames.get(mn).map(m => (y.toInt, m, d.toInt))
      case MonDY(mn, d, y) => monthNames.get(mn).map(m => (y.toInt, m, d.toInt))
      case _               => None
    }
    parsed.flatMap { case (y, m, d) =>
      try Some(java.time.LocalDate.of(y, m, d))
      catch { case _: java.time.DateTimeException => None }
    }
  }

  /** English month names as rendered (capitalized) / Spanish lowercase. */
  val monthsEn: Seq[String] = Seq("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November", "December")
  val monthsEs: Seq[String] = Seq("enero", "febrero", "marzo", "abril", "mayo",
    "junio", "julio", "agosto", "septiembre", "octubre", "noviembre", "diciembre")

  /** Render (y, m, d) in one of the grammar's NL shapes, cycled by `style` —
    * used by the round-trip query (format → parse must invert).
    */
  def render(y: Int, m: Int, d: Int, style: Int): String =
    math.floorMod(style, 4) match {
      case 0 => f"$y%04d-$m%02d-$d%02d"
      case 1 => s"$d ${monthsEn(m - 1)} $y"
      case 2 => s"${monthsEn(m - 1)} $d, $y"
      case 3 => s"$d de ${monthsEs(m - 1)} de $y"
    }

  // ---- column forms: same grammar, whole-stage codegen (the typed-map
  // round trip cost ~590 µs/row at sf0.1 — these replace it with literal-
  // pattern regexp branches + make_date, all inside codegen) --------------

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.{functions => F}

  /** Column form of [[render]]: one of the 4 NL shapes, cycled by `style`. */
  def renderCol(y: Column, m: Column, d: Column, style: Column): Column = {
    val en = F.array(monthsEn.map(F.lit): _*)
    val es = F.array(monthsEs.map(F.lit): _*)
    val s = F.pmod(style, F.lit(4))
    F.when(s === 0, F.format_string("%04d-%02d-%02d", y, m, d))
      .when(s === 1, F.concat(d.cast("string"), F.lit(" "), F.element_at(en, m),
        F.lit(" "), y.cast("string")))
      .when(s === 2, F.concat(F.element_at(en, m), F.lit(" "), d.cast("string"),
        F.lit(", "), y.cast("string")))
      .otherwise(F.concat(d.cast("string"), F.lit(" de "), F.element_at(es, m),
        F.lit(" de "), y.cast("string")))
  }

  /** Boxed epoch-day form of [[parse]] for codegen (null = grammar reject
    * or out-of-range fields — the parse-success filter F4).
    */
  def parseToDaysBoxed(s: String): Integer = parse(s) match {
    case Some(d) => Integer.valueOf(d.toEpochDay.toInt)
    case None    => null
  }

  /** Column form of [[parse]]: a native Catalyst expression (DateParse) —
    * one static call per row with statically-compiled patterns. An
    * equivalent regexp_extract column tree blows the 64 KB Janino method
    * limit (16 inlined regex evals) and drops the stage out of whole-stage
    * codegen; this stays inside it. Returns DateType, null on reject.
    */
  def parseCol(c: Column): Column = expressions.dateParse(c)

  /** One alternation covering every grammar shape, month names explicit —
    * the in-text search pattern (Spark form of `search_dates(text)`,
    * /root/reference/src/methods/DateParser.py:45). Word-bounded so prose
    * around a date never extends a match.
    */
  val SearchPattern: String = {
    val mon = "(?i:" + (monthsEn ++ monthsEs).mkString("|") + ")"
    "\\b(?:" +
      "\\d{4}-\\d{2}-\\d{2}" +
      "|\\d{1,2}[/.]\\d{1,2}[/.]\\d{4}" +
      s"|\\d{1,2} de $mon de \\d{4}" +
      s"|\\d{1,2} $mon,? \\d{4}" +
      s"|$mon \\d{1,2},? \\d{4}" +
      ")\\b"
  }

  /** Date-mention test corpus: normalized documents + a planted suffix
    * `" Signed on D1. Effective D2."` — D2 == D1 every 5th doc, so the scan
    * must position the SAME surface at two offsets (find_all_occurrences
    * semantics) — plus an invalid `" Due 30 February <y>."` every 9th doc
    * that the grammar matches but the parse-success filter F4 must drop.
    * All plants are doc_id modular arithmetic, DuckDB-reproducible
    * (Oracle.qDateMentions).
    */
  def dateCorpus(spark: org.apache.spark.sql.SparkSession, sfDir: String)
      : org.apache.spark.sql.DataFrame = {
    // qDateMentions' position arithmetic assumes the base corpus is
    // digit-free (the only grammar matches are the plants) — fail fast
    // otherwise (memoized; see CorpusAsserts).
    graft.verify.CorpusAsserts.assertPlantSafe(spark, sfDir)
    val id = F.col("doc_id")
    val y1 = (F.lit(2000) + id % 26).cast("int")
    val m1 = (id % 12 + 1).cast("int")
    val d1 = (id % 28 + 1).cast("int")
    val st1 = (id % 4).cast("int")
    val same = id % 5 === 0
    val y2 = F.when(same, y1).otherwise((F.lit(2000) + (id + 7) % 26).cast("int"))
    val m2 = F.when(same, m1).otherwise(((id + 5) % 12 + 1).cast("int"))
    val d2 = F.when(same, d1).otherwise(((id + 11) % 28 + 1).cast("int"))
    val st2 = F.when(same, st1).otherwise(((id + 1) % 4).cast("int"))
    val invalid = F.when(id % 9 === 0,
      F.concat(F.lit(" Due 30 February "), y1.cast("string"), F.lit("."))).otherwise(F.lit(""))
    // the regexFindAll date scan downstream runs in the scan stage —
    // spread a single-split source over the cores (guide §2.5)
    graft.util.Reads.spread(spark,
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(id, F.regexp_replace(F.trim(F.col("text")), "\\s+", " ").as("base")))
      .select(F.col("doc_id"), F.concat(F.col("base"), F.lit(" Signed on "),
        renderCol(y1, m1, d1, st1), F.lit(". Effective "),
        renderCol(y2, m2, d2, st2), F.lit("."), invalid).as("text"))
  }

  /** In-text date-mention scan: every positioned occurrence of a date shape
    * in `textCol` (Spark form of `search_dates` + `find_all_occurrences`,
    * DateParser.py:19-31,45). Emits one row per occurrence with char
    * offsets; unparseable shapes (Feb 30) are dropped — the parse-success
    * filter F4 (FlairDateParserModel.py:31-36). Narrow: scan + explode +
    * codegen parse, no shuffle.
    */
  def dateMentions(df: org.apache.spark.sql.DataFrame, textCol: String = "text")
      : org.apache.spark.sql.DataFrame = {
    val exploded = df
      .withColumn("dm", F.explode(expressions.regexFindAll(F.col(textCol), SearchPattern)))
      .withColumn("parsed_date", parseCol(F.col("dm.surface")))
      .filter(F.col("parsed_date").isNotNull)
    exploded.select(
      df.columns.filter(_ != textCol).map(F.col).toSeq ++ Seq(
        F.col("dm.surface").as("surface"),
        F.col("dm.start").cast("long").as("pos"),
        F.col("dm.end").cast("long").as("pos_end"),
        F.col("parsed_date").cast("string").as("parsed_date")): _*)
  }
}
