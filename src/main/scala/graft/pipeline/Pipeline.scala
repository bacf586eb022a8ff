package graft.pipeline

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** dbitool-compatible pipeline specs, compiled to DataFrame plans.
  *
  * The reference assembles a module DAG from CLI words
  * (`name:arg=val:arg=val ...`, /root/reference/scripts/
  * dbitool.pl:66-155) connected by named streams, then pumps rows with
  * a cooperative scheduler. Here the same words COMPILE to a lazy
  * DataFrame graph: streams are named DataFrame references (multi-
  * reader fan-out is free — Spark plans are immutable), the scheduler
  * is Catalyst + distributed execution, and sinks become actions run
  * by `Pipeline.run`.
  *
  * Preserved reference semantics:
  *  - `in=`/`out=` stream naming; implicit `streamN` names and
  *    last-out chaining (dbitool.pl:671-680)
  *  - `@file` shortcuts: `in=@f.csv` ⇒ fileread, `out=@f` ⇒ filewrite
  *    (dbitool.pl:93-103)
  *  - raw vs row stream typing, validated at build time
  *    (dbitool.pl:3060-3084; type check dbitool.pl:665-666)
  *  - every stream needs ≥1 writer and ≥1 reader (dbitool.pl:581-591)
  *  - log channel as consumable data (`in=log`), drained after data
  *    sinks finish (dbitool.pl:845-874, 245-252)
  *  - `listModules` registry table (dbitool.pl:158-171, 2972-2998)
  *  - per-module stats (rows through each named stream) on request
  *    (dbitool.pl:595-623)
  *
  * Extensions (the reference's own TODO list + north star): filter,
  * select, join, agg, sort, limit, union, dedup.
  */
object Pipeline {

  sealed trait StreamType { def label: String }
  case object RawType extends StreamType { val label = "raw" }
  case object RowType extends StreamType { val label = "row" }
  case object NoneType extends StreamType { val label = "none" }

  case class ModuleSpec(name: String, args: Map[String, String], raw: String)

  final class BuildError(msg: String) extends RuntimeException(msg)

  /** One parsed CLI word: `name(:k=v|:flag)*`. Flags parse as k -> "1".
    * `url=` swallows following `:`-segments (JDBC URLs contain colons)
    * UNTIL a `key=`-shaped argument appears (bare `\w+` key) — so both
    * `...:url=jdbc:...` last-position and the usage-template order
    * `url=...:table=t` parse as documented, and modules whose `url=`
    * is a COLUMN name (urlnorm, warcwrite) take args in any order. A
    * genuine URL's own colon-segments never look like `word=value`
    * (JDBC attrs ride `;create=true`, query params `?a=b` — neither
    * prefix is a bare `\w+`). Credentials belong in user=/pw= args,
    * not inside the URL. `cmd=` (exec) gets the same swallow — shell
    * commands may contain colons too.
    */
  def parseWord(word: String): ModuleSpec = {
    val parts = word.split(":", -1)
    val name = parts.head
    if (!name.matches("\\w+"))
      throw new BuildError(s"bad module word: '$word'")
    val pieces = {
      val i = parts.indexWhere(p => p.startsWith("url=") || p.startsWith("cmd=")
        || p.startsWith("query="))
      if (i >= 1) {
        val rest = parts.drop(i)
        val j = rest.indexWhere(p => {
          val eq = p.indexOf('=')
          eq > 0 && p.substring(0, eq).matches("\\w+")
        }, 1)
        val url = (if (j < 0) rest else rest.take(j)).mkString(":")
        parts.slice(1, i) ++ (url +: (if (j < 0) Array.empty[String] else rest.drop(j)))
      } else parts.tail
    }
    val args = pieces.map { p =>
      p.split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> "1"
      }
    }.toMap
    ModuleSpec(name, args, word)
  }

  case class Registered(name: String, inType: StreamType, outType: StreamType,
                        argHelp: String,
                        build: (Context, ModuleSpec) => Unit)

  /** Build-time state: named streams, pending sink actions, log rows. */
  final class Context(val spark: SparkSession) {
    val streams = mutable.LinkedHashMap[String, (DataFrame, StreamType)]()
    val writers = mutable.Map[String, Int]().withDefaultValue(0)
    val readers = mutable.Map[String, Int]().withDefaultValue(0)
    val sinks = mutable.ArrayBuffer[(String, () => Long)]()
    val logRows = mutable.ArrayBuffer[(java.sql.Timestamp, String, String)]()
    val logReaders = mutable.ArrayBuffer[(ModuleSpec, String)]()
    /** Per-module corrupt-row DataFrames (mod, record) — the reference's
      * error channel (dbitool.pl:876-890) as distributed data.
      */
    val errorDfs = mutable.ArrayBuffer[DataFrame]()
    var lastOut: Option[String] = None
    var counter = 0
    /** Codec carried ON the stream (set by gzip on its out stream, read
      * by the filewrite that consumes that stream) — mutable
      * armed-codec state would misfire in branched pipelines.
      */
    val codecs = mutable.Map[String, String]()
    /** File origin of raw streams (set by fileread) — lets gunzip
      * re-read the bytes when the text parse would be wrong.
      */
    val originPaths = mutable.Map[String, String]()

    /** progress=true (reference TODO:24-27, the row-count progress
      * relay): every bounded stream registration rides a zero-cost
      * CollectMetrics observation — counts are collected DURING the
      * sink writes (no extra actions, unlike stats=true) and relayed
      * to the log channel as each sink completes. Fan-out/self-join
      * safe: one observation per stream name, and Spark tolerates the
      * same CollectMetrics subtree on several paths of one plan.
      */
    var progressEnabled = false
    val observations =
      mutable.LinkedHashMap[String, org.apache.spark.sql.Observation]()

    def addErrors(mod: String, records: DataFrame): Unit =
      errorDfs += records.select(lit(mod).as("mod"),
        col(records.columns.head).cast("string").as("record"))

    def errorStream: DataFrame =
      if (errorDfs.isEmpty) {
        import spark.implicits._
        Seq.empty[(String, String)].toDF("mod", "record")
      } else errorDfs.reduce(_.unionByName(_))

    def log(mod: String, msg: String): Unit =
      logRows += ((new java.sql.Timestamp(System.currentTimeMillis()), mod, msg))

    def freshStream(): String = { counter += 1; s"stream$counter" }

    def inName(spec: ModuleSpec): String =
      spec.args.getOrElse("in",
        lastOut.getOrElse(throw new BuildError(
          s"${spec.name}: no in= and no previous out stream")))

    def outName(spec: ModuleSpec): String =
      spec.args.getOrElse("out", freshStream())

    def readStream(spec: ModuleSpec, expect: StreamType): DataFrame = {
      val n = inName(spec)
      val (df, t) = streams.getOrElse(n,
        throw new BuildError(s"${spec.name}: unknown in stream '$n'"))
      if (t != expect)
        throw new BuildError(
          s"${spec.name}: in stream '$n' is ${t.label}, expected ${expect.label}")
      readers(n) += 1
      df
    }

    def writeStream(spec: ModuleSpec, df: DataFrame, t: StreamType): String = {
      val n = outName(spec)
      if (writers(n) > 0) // reference: one writer per stream (README.md:13-16)
        throw new BuildError(s"${spec.name}: stream '$n' already has a writer")
      val stored =
        if (progressEnabled && !df.isStreaming) {
          val ob = new org.apache.spark.sql.Observation(s"progress_$n")
          observations(n) = ob
          df.observe(ob, count(lit(1)).as("rows"))
        } else df
      streams(n) = (stored, t)
      writers(n) += 1
      lastOut = Some(n)
      n
    }

    def addSink(name: String, action: () => Long): Unit = {
      sinks += ((name, action))
      lastOut = None
    }
  }

  // ----- module implementations -----------------------------------------

  /** Drain a raw stream to a line printer via toLocalIterator: one
    * partition resident in driver memory at a time, so a huge stream
    * piped to stdout/stderr can't OOM the driver the way a collect()
    * would (VERDICT r5 #7). Semantics unchanged — partition order is
    * the same order collect() returns.
    */
  private def streamToPrint(df: DataFrame, out: String => Unit): Long = {
    val it = df.toLocalIterator()
    var n = 0L
    while (it.hasNext) { out(it.next().getString(0)); n += 1L }
    n
  }

  private def rawDf(spark: SparkSession, path: String): DataFrame =
    graft.sources.Sources.text(spark, path)

  /** DB-select query text: exactly one of query= / table= / in=STREAM
    * (reference one-of rule, dbitool.pl:1435-1437). `in=` assembles the
    * query from an upstream raw stream, rows joined by spaces
    * (dbitool.pl:1444-1451) — query text is small, so the driver-side
    * materialization matches the reference's own buffering.
    */
  private def dbQuery(ctx: Context, m: ModuleSpec, mod: String): String = {
    val given = Seq("query", "table", "in").filter(m.args.contains)
    if (given.size != 1)
      throw new BuildError(
        s"$mod: exactly one of query=, table=, in= required (got: ${
          if (given.isEmpty) "none" else given.mkString(", ")})")
    given.head match {
      case "query" => m.args("query")
      case "table" => s"SELECT * FROM ${m.args("table")}"
      case "in" =>
        ctx.readStream(m, RawType).collect().map(_.getString(0)).mkString(" ")
    }
  }

  /** Required-argument fetch with a uniform error message. */
  private def reqArg(m: ModuleSpec, mod: String, key: String): String =
    m.args.getOrElse(key, throw new BuildError(s"$mod: $key= required"))

  /** Resolve a named SECOND row stream (queries=/anchors=/conv= style
    * args) and count the read — shared by the two-input modules.
    */
  private def secondRowStream(ctx: Context, m: ModuleSpec, mod: String,
                              arg: String): DataFrame = {
    val name = reqArg(m, mod, arg)
    val (df, t) = ctx.streams.getOrElse(name,
      throw new BuildError(s"$mod: unknown stream '$name'"))
    if (t != RowType)
      throw new BuildError(s"$mod: '$name' is not a row stream")
    ctx.readers(name) += 1
    df
  }

  /** Shared near-dup pair source for the dedupnear / dedupcluster /
    * survivor family: the six method×hash fingerprint combinations
    * (all banded equi-joins with hub cut + exact verify, never
    * all-pairs).
    */
  private def nearDupPairSource(df: DataFrame, key: String, text: String,
                                m: ModuleSpec): DataFrame = {
    import graft.operators.{Dedup, DedupPortable}
    val threshold = m.args.getOrElse("threshold", "0.8").toDouble
    val k = m.args.getOrElse("k", "3").toInt
    val maxDist = m.args.getOrElse("maxdist", "3").toInt
    (m.args.getOrElse("method", "minhash"),
        m.args.getOrElse("hash", "xx")) match {
      case ("minhash", "xx") =>
        Dedup.minhashDuplicatePairs(df, key, text, k = k, threshold = threshold)
      case ("minhash", "md5") => DedupPortable
        .minhashDuplicatePairsPortable(df, key, text, k = k, threshold = threshold)
      case ("simhash", "xx") =>
        Dedup.simhashDuplicatePairs(df, key, text, maxDist = maxDist)
      case ("simhash", "md5") => DedupPortable
        .simhashDuplicatePairsPortable(df, key, text, maxDist = maxDist)
      case ("winnow", "xx") =>
        Dedup.winnowDuplicatePairs(df, key, text, threshold = threshold)
      case ("winnow", "md5") => DedupPortable
        .winnowDuplicatePairsPortable(df, key, text, threshold = threshold)
      // containment is md5-family by construction (portable shingle
      // inverted index); accept either hash= spelling
      case ("containment", _) =>
        Dedup.containmentPairs(df, key, text, k = k, threshold = threshold)
      // EXACT prefix-filter jaccard (PPJoin family), hash-free by
      // construction. pairsmode=starEdges (the default) emits the
      // linear rep-edge certificate — both the greedy pair-drop and
      // the transitive clustering consume it with IDENTICAL results
      // (DedupSimSpec pins both equalities), so the module never pays
      // the member-squared expansion; pairsmode=all for the full list.
      case ("prefix", _) =>
        Dedup.prefixJaccardPairs(df, key, text, threshold,
          pairsMode = m.args.getOrElse("pairsmode", "starEdges"))
      case (meth, h) => throw new BuildError(
        s"${m.name}: method=$meth hash=$h (methods: minhash, simhash, winnow, containment, prefix; hashes: xx, md5)")
    }
  }

  private val modules: Seq[Registered] = Seq(
    Registered("fileread", NoneType, RawType, "in=FILE:out=STREAM", (ctx, m) => {
      val path = m.args.getOrElse("in", throw new BuildError("fileread: in= required"))
      val out = ctx.writeStream(m.copy(args = m.args - "in"), rawDf(ctx.spark, path), RawType)
      ctx.originPaths(out) = path
      ctx.log("fileread", s"open $path")
    }),

    // Dynamic per-file fan-out (reference TODO "file type", one stream
    // per input file): lists the glob AT BUILD TIME and registers one
    // raw stream per match — prefix0, prefix1, ... in lexicographic
    // path order — plus a (stream, path) manifest as the module's own
    // out stream, so a pipeline can both address individual files and
    // enumerate what matched. Per-file streams are read-optional (the
    // match count isn't knowable when the pipeline is written), which
    // exempts them from the dangling-stream check; the manifest is a
    // normal stream and must be consumed.
    Registered("globread", NoneType, RowType,
      "in=GLOB:prefix=NAME:out=STREAM (registers raw streams NAME0..; out = manifest of stream,path)",
      (ctx, m) => {
        val pattern = m.args.getOrElse("in",
          throw new BuildError("globread: in= required"))
        val prefix = m.args.getOrElse("prefix",
          throw new BuildError("globread: prefix= required"))
        val hPath = new org.apache.hadoop.fs.Path(pattern)
        val fs = hPath.getFileSystem(
          ctx.spark.sparkContext.hadoopConfiguration)
        val matches = Option(fs.globStatus(hPath)).map(_.toSeq)
          .getOrElse(Seq.empty)
          .filter(_.isFile).map(_.getPath.toString).sorted
        if (matches.isEmpty)
          throw new BuildError(s"globread: no files match '$pattern'")
        matches.zipWithIndex.foreach { case (p, i) =>
          val name = s"$prefix$i"
          if (ctx.writers(name) > 0)
            throw new BuildError(s"globread: stream '$name' already has a writer")
          ctx.streams(name) = (rawDf(ctx.spark, p), RawType)
          ctx.writers(name) += 1
          ctx.readers(name) += 1 // read-optional by design (see scaladoc)
          ctx.originPaths(name) = p
        }
        ctx.log("globread", s"matched ${matches.size} files for $pattern")
        import ctx.spark.implicits._
        val manifest = matches.zipWithIndex
          .map { case (p, i) => (s"$prefix$i", p) }
          .toDF("stream", "path")
        ctx.writeStream(m.copy(args = m.args - "in"), manifest, RowType)
      }),

    Registered("filewrite", RawType, NoneType, "in=STREAM:out=FILE[:gzip]", (ctx, m) => {
      val df = ctx.readStream(m, RawType)
      val path = m.args.getOrElse("out", throw new BuildError("filewrite: out= required"))
      val codec = ctx.codecs.get(ctx.inName(m)).orElse(
        if (m.args.contains("gzip") || path.endsWith(".gz")) Some("gzip") else None)
      ctx.addSink(m.raw, () => {
        // Row count observed DURING the write — a separate df.count()
        // would execute the whole upstream plan twice.
        val o = org.apache.spark.sql.Observation()
        val observed = df.observe(o, count(lit(1)).as("rows"))
        graft.sinks.Sinks.text(observed, path, singleFile = true, compression = codec)
        val n = o.get("rows").asInstanceOf[Long]
        ctx.log("filewrite", s"wrote $n rows to $path")
        n
      })
    }),

    Registered("stdin", NoneType, RawType, "out=STREAM", (ctx, m) => {
      import scala.jdk.CollectionConverters._
      val lines = new java.io.BufferedReader(
        new java.io.InputStreamReader(System.in)).lines().iterator().asScala.toSeq
      import ctx.spark.implicits._
      ctx.writeStream(m, lines.toDF("col1"), RawType)
    }),

    Registered("stdout", RawType, NoneType, "in=STREAM", (ctx, m) => {
      val df = ctx.readStream(m, RawType)
      ctx.addSink(m.raw, () => streamToPrint(df, println))
    }),

    Registered("stderr", RawType, NoneType, "in=STREAM", (ctx, m) => {
      val df = ctx.readStream(m, RawType)
      ctx.addSink(m.raw, () => streamToPrint(df, System.err.println(_: String)))
    }),

    Registered("csvread", RawType, RowType,
      "in=STREAM:out=STREAM:sep=,:quote=x:escape=x:header=1:infer=0:eol=x", (ctx, m) => {
        val df = ctx.readStream(m, RawType)
        import ctx.spark.implicits._
        val lines = df.select(col("col1")).as[String]
        def reader = ctx.spark.read
          .option("header", m.args.getOrElse("header", "1") == "1")
          .option("sep", m.args.getOrElse("sep", ","))
          .option("quote", m.args.getOrElse("quote", "\""))
          .option("escape", m.args.getOrElse("escape", "\""))
          .option("inferSchema", m.args.getOrElse("infer", "0") == "1")
        // Two-phase read: resolve the schema on a BOUNDED sample (a
        // full inference pass would double the scan cost at scale),
        // then one PERMISSIVE pass with a corrupt-record column —
        // malformed rows route to the error channel instead of
        // poisoning the data stream (reference error semantics,
        // dbitool.pl:234-243). The reference itself types from the
        // header row only (dbitool.pl:3077-3078); 10k lines is a
        // strictly stronger sample.
        val schema = reader.csv(lines.limit(10000)).schema
          .add("_corrupt_record", org.apache.spark.sql.types.StringType)
        val parsed = reader
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .schema(schema)
          .csv(lines)
        ctx.addErrors("csvread",
          parsed.filter(col("_corrupt_record").isNotNull)
            .select(col("_corrupt_record")))
        ctx.writeStream(m,
          parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
          RowType)
      }),

    Registered("csvwrite", RowType, RawType,
      "in=STREAM:out=STREAM:sep=,:header=1", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val sep = m.args.getOrElse("sep", ",")
        val body = df.select(to_csv(struct(df.columns.map(col): _*),
          new java.util.HashMap[String, String] {
            put("sep", sep); put("quote", "\""); put("escape", "\"")
          }).as("col1"))
        val out =
          if (m.args.getOrElse("header", "1") == "1") {
            import ctx.spark.implicits._
            // Prepend the header INSIDE one partition — a union'd
            // header row has no stable position under AQE.
            // repartition(1), not coalesce: an empty frame has 0
            // partitions and coalesce(1) would drop the header.
            val hdr = df.columns.mkString(sep)
            body.select(col("col1")).as[String].repartition(1)
              .mapPartitions(it => Iterator(hdr) ++ it).toDF("col1")
          } else body
        ctx.writeStream(m, out, RawType)
      }),

    Registered("ndjsonread", RawType, RowType, "in=STREAM:out=STREAM:utf8=1:newline=x", (ctx, m) => {
      val df = ctx.readStream(m, RawType)
      import ctx.spark.implicits._
      val parsed = ctx.spark.read.json(df.select(col("col1")).as[String])
      // Spark's JSON inference surfaces unparseable lines as a
      // _corrupt_record column — route them to the error channel.
      val out =
        if (parsed.columns.contains("_corrupt_record")) {
          ctx.addErrors("ndjsonread",
            parsed.filter(col("_corrupt_record").isNotNull)
              .select(col("_corrupt_record")))
          parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
        } else parsed
      ctx.writeStream(m, out, RowType)
    }),

    Registered("ndjsonwrite", RowType, RawType, "in=STREAM:out=STREAM", (ctx, m) => {
      val df = ctx.readStream(m, RowType)
      ctx.writeStream(m,
        df.select(to_json(struct(df.columns.map(col): _*)).as("col1")), RawType)
    }),

    Registered("jsonread", RawType, RowType, "in=STREAM:out=STREAM:utf8=1", (ctx, m) => {
      // Whole-document JSON array — in-memory by design, like the
      // reference (dbitool.pl:2228-2242).
      val df = ctx.readStream(m, RawType)
      import ctx.spark.implicits._
      val doc = df.select(col("col1")).as[String].collect().mkString("\n")
      val ds = ctx.spark.createDataset(Seq(doc))
      ctx.writeStream(m, ctx.spark.read.json(ds), RowType)
    }),

    Registered("jsonwrite", RowType, RawType, "in=STREAM:out=STREAM", (ctx, m) => {
      val df = ctx.readStream(m, RowType)
      import ctx.spark.implicits._
      // Single-document accumulation (reference dbitool.pl:2307-2311):
      // the output IS one string, so driver memory ~doc size is
      // inherent — but stream the rows in (one partition resident at a
      // time) instead of collect(), so the peak is the document alone,
      // not rows + document (VERDICT r5 #7).
      val sb = new java.lang.StringBuilder("[")
      val it = df.toJSON.toLocalIterator()
      var first = true
      while (it.hasNext) {
        if (!first) sb.append(',')
        sb.append(it.next()); first = false
      }
      sb.append(']')
      ctx.writeStream(m, Seq(sb.toString).toDF("col1"), RawType)
    }),

    Registered("fixedwidthread", RawType, RowType,
      "in=STREAM:out=STREAM:width=8,4:trim=1:header=0", (ctx, m) => {
        val df = ctx.readStream(m, RawType)
        val widths = m.args.getOrElse("width",
          throw new BuildError("fixedwidthread: width= required"))
          .split(",").map(_.trim.toInt).toSeq
        val trim0 = m.args.getOrElse("trim", "1") == "1"
        val hasHeader = m.args.getOrElse("header", "0") == "1"
        val offsets = widths.scanLeft(1)(_ + _)
        val names =
          if (hasHeader) {
            val first = df.limit(1).collect().head.getString(0)
            widths.indices.map(i =>
              first.slice(offsets(i) - 1, offsets(i) - 1 + widths(i)).trim)
          } else widths.indices.map(i => s"col${i + 1}")
        // Per-FILE header drop (multi-file inputs keep every file's
        // header as data under a naive global-first-row filter).
        val body =
          if (hasHeader) graft.sources.Sources.dropFirstLinePerFile(df)
          else df
        val cols = widths.indices.map { i =>
          val c = substring(col("col1"), offsets(i), widths(i))
          (if (trim0) trim(c) else c).as(names(i))
        }
        ctx.writeStream(m, body.select(cols: _*), RowType)
      }),

    Registered("fixedwidthwrite", RowType, RawType,
      "in=STREAM:out=STREAM:width=8,4:header=0", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val widths = m.args.getOrElse("width",
          throw new BuildError("fixedwidthwrite: width= required"))
          .split(",").map(_.trim.toInt).toSeq
        if (widths.length != df.columns.length)
          throw new BuildError("fixedwidthwrite: width count != column count")
        val line = concat(df.columns.zip(widths).map { case (c, w) =>
          rpad(coalesce(col(c).cast("string"), lit("")).substr(1, w), w, " ")
        }: _*).as("col1")
        val body = df.select(line)
        val out =
          if (m.args.getOrElse("header", "0") == "1") {
            import ctx.spark.implicits._
            val h = df.columns.zip(widths)
              .map { case (c, w) => c.take(w).padTo(w, ' ') }.mkString
            body.as[String].repartition(1)
              .mapPartitions(it => Iterator(h) ++ it).toDF("col1")
          } else body
        ctx.writeStream(m, out, RawType)
      }),

    Registered("xmlread", NoneType, RowType,
      "in=FILE:out=STREAM:row=row:root=x:trim=1:attrprefix=_", (ctx, m) => {
        // Whole-document XML needs the file boundary (the reference
        // buffers the full input too, dbitool.pl:2095-2104); Spark 4's
        // built-in XML source handles rowTag extraction distributed.
        // root/trim accepted for reference-spec compat (rowTag drives
        // extraction; Spark trims text nodes itself).
        val path = m.args.getOrElse("in", throw new BuildError("xmlread: in= required"))
        ctx.writeStream(m.copy(args = m.args - "in"),
          graft.sources.Sources.xml(ctx.spark, path,
            rowTag = m.args.getOrElse("row", "row"),
            attrPrefix = m.args.getOrElse("attrprefix", "_")), RowType)
      }),

    Registered("xmlwrite", RowType, RawType,
      "in=STREAM:out=STREAM:row=row", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val rowTag = m.args.getOrElse("row", "row")
        def esc(c: org.apache.spark.sql.Column) =
          regexp_replace(regexp_replace(regexp_replace(
            c.cast("string"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
        val inner = concat(df.columns.map(c =>
          concat(lit(s"<$c>"), esc(col(c)), lit(s"</$c>"))): _*)
        ctx.writeStream(m,
          df.select(concat(lit(s"<$rowTag>"), inner, lit(s"</$rowTag>")).as("col1")),
          RawType)
      }),

    // DB modules (dbitool.pl:1387-1755) over Spark's JDBC source/sink.
    // The zero-egress image ships no JDBC drivers, so these fail at
    // run with the driver-missing error — the module surface, arg
    // validation, and plan wiring are real.
    Registered("mysqlselect", NoneType, RowType,
      "host=localhost:port=3306:user=u:pw=p:db=d:query=SQL:table=t:in=STREAM:out=STREAM",
      (ctx, m) => {
        val host = m.args.getOrElse("host", "localhost")
        val port = m.args.getOrElse("port", "3306")
        val db = m.args.getOrElse("db", throw new BuildError("mysqlselect: db= required"))
        val q = dbQuery(ctx, m, "mysqlselect")
        val props = Map("user" -> m.args.getOrElse("user", ""),
          "password" -> m.args.getOrElse("pw", ""))
        ctx.writeStream(m, graft.sources.Sources.jdbc(ctx.spark,
          s"jdbc:mysql://$host:$port/$db", q, props), RowType)
      }),

    Registered("sqliteselect", NoneType, RowType,
      "fname=FILE:query=SQL:table=t:in=STREAM:out=STREAM", (ctx, m) => {
        val f = m.args.getOrElse("fname",
          throw new BuildError("sqliteselect: fname= required"))
        val q = dbQuery(ctx, m, "sqliteselect")
        ctx.writeStream(m, graft.sources.Sources.jdbc(ctx.spark,
          s"jdbc:sqlite:$f", q), RowType)
      }),

    // Generic JDBC modules (extension): the url= form of the DB-select
    // surface, e2e-testable against any driver on the classpath (the
    // image ships embedded Derby). mysqlselect/sqliteselect are the
    // reference-named sugar over the same Sources.jdbc/Sinks.jdbc path.
    Registered("jdbcselect", NoneType, RowType,
      "url=JDBC_URL:driver=CLASS:user=u:pw=p:query=SQL:table=t:in=STREAM:out=STREAM",
      (ctx, m) => {
        val url = m.args.getOrElse("url",
          throw new BuildError("jdbcselect: url= required"))
        val q = dbQuery(ctx, m, "jdbcselect")
        val props = Seq("driver", "user").flatMap(k => m.args.get(k).map(k -> _)) ++
          m.args.get("pw").map("password" -> _)
        ctx.writeStream(m, graft.sources.Sources.jdbc(ctx.spark, url, q,
          props.toMap), RowType)
      }),

    Registered("jdbcinsert", RowType, NoneType,
      "in=STREAM:url=JDBC_URL:driver=CLASS:table=t", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val url = m.args.getOrElse("url",
          throw new BuildError("jdbcinsert: url= required"))
        val t = m.args.getOrElse("table",
          throw new BuildError("jdbcinsert: table= required"))
        val props = Seq("driver", "user").flatMap(k => m.args.get(k).map(k -> _)) ++
          m.args.get("pw").map("password" -> _)
        ctx.addSink(m.raw, () => {
          val o = org.apache.spark.sql.Observation()
          val observed = df.observe(o, count(lit(1)).as("rows"))
          graft.sinks.Sinks.jdbc(observed, url, t, props = props.toMap)
          o.get("rows").asInstanceOf[Long]
        })
      }),

    // cassandraselect (dbitool.pl:1461-1532): registered with the
    // reference's arg surface and one-of validation; no Cassandra
    // connector jar exists in this build, so a valid spec fails with
    // an explicit capability error rather than a missing-module error.
    Registered("cassandraselect", NoneType, RowType,
      "host=localhost:keyspace=k:consistency=one:query=SQL:table=t:in=STREAM:out=STREAM",
      (ctx, m) => {
        if (m.args.getOrElse("host", "localhost").isEmpty)
          throw new BuildError("cassandraselect: host not specified")
        if (m.args.getOrElse("keyspace", "").isEmpty)
          throw new BuildError("cassandraselect: keyspace= required")
        dbQuery(ctx, m, "cassandraselect")
        throw new BuildError(
          "cassandraselect: no Cassandra connector available in this build " +
            "(module surface registered for spec parity)")
      }),

    Registered("sqliteinsert", RowType, NoneType,
      "in=STREAM:fname=FILE:table=t", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val f = m.args.getOrElse("fname",
          throw new BuildError("sqliteinsert: fname= required"))
        val t = m.args.getOrElse("table",
          throw new BuildError("sqliteinsert: table= required"))
        ctx.addSink(m.raw, () => {
          graft.sinks.Sinks.jdbc(df, s"jdbc:sqlite:$f", t)
          df.count()
        })
      }),

    // log/error are channels, not buildable words: listed for
    // --listmodules parity (dbitool.pl:2972-2998); consumed via
    // in=log / in=error on any module.
    Registered("log", NoneType, RowType, "consume with in=log", (_, m) =>
      throw new BuildError("log: tap the channel with in=log on a consumer")),
    Registered("error", NoneType, RowType, "consume with in=error", (_, m) =>
      throw new BuildError("error: tap the channel with in=error on a consumer")),

    Registered("gzip", RawType, RawType, "in=STREAM:out=STREAM:level=6", (ctx, m) => {
      // Spark model: compression is a file-boundary codec. The module
      // passes rows through and arms the next filewrite with gzip —
      // the edge-compression the reference's own docs recommend over
      // its in-tree gzip (dbitool.pl:3304-3307).
      val df = ctx.readStream(m, RawType)
      val out = ctx.writeStream(m, df, RawType)
      ctx.codecs(out) = "gzip"
    }),

    Registered("gunzip", RawType, RawType, "in=STREAM:out=STREAM", (ctx, m) => {
      // Three cases, mirroring the reference's lazy header sniff
      // (dbitool.pl:1295-1299):
      //  - file-origin stream NOT named *.gz: the text parse upstream
      //    would be mojibake — re-read the bytes per file, sniff the
      //    1F 8B magic, and decompress through GZIPInputStream
      //    (gzip members aren't splittable; one task per file, the
      //    same unit of work any engine gets for raw gzip).
      //  - *.gz file: Spark's text reader already decompressed it —
      //    pass through.
      //  - in-memory stream: strings can't carry gzip bytes — pass
      //    through.
      val df = ctx.readStream(m, RawType)
      val out = ctx.originPaths.get(ctx.inName(m)) match {
        case Some(path) if !path.endsWith(".gz") =>
          import ctx.spark.implicits._
          ctx.spark.read.format("binaryFile").load(path)
            .select(col("content")).as[Array[Byte]]
            .flatMap { bytes =>
              val raw = new java.io.ByteArrayInputStream(bytes)
              val in =
                if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F
                  && (bytes(1) & 0xFF) == 0x8B)
                  new java.util.zip.GZIPInputStream(raw)
                else raw
              scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            }.toDF("col1")
        case _ => df
      }
      ctx.writeStream(m, out, RawType)
    }),

    Registered("dbdumpread", NoneType, RowType,
      "in=DUMPFILE:out=STREAM", (ctx, m) => {
        // Executable migration path for the reference's Berkeley-DB ndb
        // files (which no plain JVM can open): `db_dump` output is a
        // standardized TEXT format (VERSION=3 header, HEADER=END, then
        // alternating key/value lines, DATA=END), and the reference
        // stores each row as a JSON array under its key with the column
        // list under the magic "_col" key (dbitool.pl:2669-2686,
        // :2607-2612). Parse the dump, decode hex ("format=bytevalue")
        // or print-escaped ("format=print") payloads, reconstruct
        // columns from _col, and emit a row stream — `db_dump f.ndb |`
        // this module replaces the unopenable binary. Whole-file,
        // driver-side (the reference ties the whole DB in memory too).
        val path = m.args.getOrElse("in",
          throw new BuildError("dbdumpread: in= required"))
        import scala.jdk.CollectionConverters._
        val all = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get(path)).asScala.toSeq
        val headerEnd = all.indexWhere(_ == "HEADER=END")
        if (headerEnd < 0)
          throw new BuildError(s"dbdumpread: no HEADER=END in $path")
        val fmt = all.take(headerEnd).collectFirst {
          case l if l.startsWith("format=") => l.drop("format=".length)
        }.getOrElse("bytevalue")
        def decode(l: String): String = {
          val s = if (l.startsWith(" ")) l.drop(1) else l
          // both branches accumulate BYTES and UTF-8-decode once at the
          // end — decoding print escapes char-by-char would mojibake
          // multi-byte UTF-8 data (\c3\a9 is one "é", not "Ã©"); and
          // every malformed escape/hex digit fails loudly as a
          // BuildError with file context, never a bare
          // NumberFormatException.
          def badDump(why: String) =
            throw new BuildError(s"dbdumpread: $why in $path (line: '$l')")
          def hexByte(h: String): Byte =
            try Integer.parseInt(h, 16).toByte
            catch { case _: NumberFormatException => badDump(s"bad hex '$h'") }
          val bos = new java.io.ByteArrayOutputStream(s.length)
          fmt match {
            case "bytevalue" =>
              if (s.length % 2 != 0) badDump("odd-length hex line")
              var i = 0
              while (i < s.length) {
                bos.write(hexByte(s.substring(i, i + 2))); i += 2
              }
            case "print" =>
              var i = 0
              while (i < s.length) {
                if (s(i) == '\\' && i + 1 < s.length && s(i + 1) == '\\') {
                  bos.write('\\'.toInt); i += 2
                } else if (s(i) == '\\') {
                  if (i + 2 >= s.length) badDump("truncated \\xx escape")
                  bos.write(hexByte(s.substring(i + 1, i + 3))); i += 3
                } else if (s(i) < 0x80) {
                  bos.write(s(i).toInt); i += 1
                } else {
                  // conformant db_dump escapes bytes >= 0x80, but a
                  // hand-edited dump may carry raw non-ASCII — emit its
                  // UTF-8 bytes (surrogate pairs taken together), never
                  // a truncated low byte
                  val cp = s.codePointAt(i)
                  bos.writeBytes(new String(Character.toChars(cp))
                    .getBytes("UTF-8"))
                  i += Character.charCount(cp)
                }
              }
            case other =>
              throw new BuildError(s"dbdumpread: unsupported format=$other")
          }
          new String(bos.toByteArray, "UTF-8")
        }
        val data = all.drop(headerEnd + 1).takeWhile(_ != "DATA=END")
        if (data.length % 2 != 0)
          throw new BuildError(s"dbdumpread: odd key/value line count in $path")
        val pairs = data.grouped(2).map(p => (decode(p(0)), decode(p(1)))).toSeq
        import ctx.spark.implicits._
        import org.apache.spark.sql.types.{ArrayType, StringType}
        val parsed = pairs.toDF("__k", "__v")
          .select(col("__k"),
            from_json(col("__v"), ArrayType(StringType)).as("__arr"))
        val names = parsed.filter(col("__k") === "_col")
          .select(col("__arr")).collect().headOption
          .map { r =>
            if (r.isNullAt(0)) // from_json yields null on malformed JSON
              throw new BuildError(
                s"dbdumpread: _col row is not a JSON string array in $path")
            r.getSeq[String](0)
          }
          .getOrElse(throw new BuildError(
            s"dbdumpread: no _col schema row in $path (not a dbitool ndb dump?)"))
        val rows = parsed.filter(col("__k") =!= "_col")
          .select(names.zipWithIndex.map { case (n, i) =>
            col("__arr").getItem(i).as(n)
          }: _*)
        ctx.writeStream(m.copy(args = m.args - "in"), rows, RowType)
        ctx.log("dbdumpread", s"read ${pairs.length - 1} rows from $path")
      }),

    Registered("zipread", NoneType, RawType,
      "in=ZIPFILE[:entry=NAME]:out=STREAM", (ctx, m) => {
        // Reference TODO:48-50 (unimplemented there): read one zip file
        // with one or many entries. A zip is a whole-container local
        // format — entries are enumerated and inflated driver-side
        // through the same pure-JDK java.util.zip plumbing the xlsx/ods
        // codecs use (central directory via ZipFile, no temp files),
        // then parallelized as a raw line stream. Same in-memory caveat
        // as jsonread/bsonread; for splittable scale paths use
        // csvread/ndjsonread on extracted files.
        val path = m.args.getOrElse("in",
          throw new BuildError("zipread: in= required"))
        val entrySel = m.args.get("entry")
        val zf = new java.util.zip.ZipFile(path)
        val lines: Seq[String] = try {
          import scala.jdk.CollectionConverters._
          val entries = zf.entries().asScala.filterNot(_.isDirectory)
            .filter(e => entrySel.forall(_ == e.getName)).toSeq
          if (entries.isEmpty)
            throw new BuildError(entrySel match {
              case Some(n) => s"zipread: entry '$n' not found in $path"
              case None => s"zipread: no entries in $path"
            })
          entries.flatMap { e =>
            val src = scala.io.Source.fromInputStream(zf.getInputStream(e), "UTF-8")
            try src.getLines().toVector finally src.close()
          }
        } finally zf.close()
        import ctx.spark.implicits._
        ctx.writeStream(m.copy(args = m.args - "in"), lines.toDF("col1"), RawType)
        ctx.log("zipread", s"read ${lines.size} lines from $path")
      }),

    Registered("zipwrite", RawType, NoneType,
      "in=STREAM:out=ZIPFILE[:entry=NAME]", (ctx, m) => {
        // Reference TODO:51-53: write the stream as a single-entry zip
        // file. Single output file ⇒ driver-side assembly (the same
        // whole-document shape as jsonwrite, which the reference also
        // buffers fully, dbitool.pl:2307-2311).
        val df = ctx.readStream(m, RawType)
        val path = m.args.getOrElse("out",
          throw new BuildError("zipwrite: out= required"))
        val entry = m.args.getOrElse("entry", "data")
        ctx.addSink(m.raw, () => {
          val rows = df.collect().map(_.getString(0))
          val f = new java.io.File(path)
          Option(f.getParentFile).foreach(_.mkdirs())
          val zos = new java.util.zip.ZipOutputStream(
            new java.io.FileOutputStream(f))
          try {
            zos.putNextEntry(new java.util.zip.ZipEntry(entry))
            if (rows.nonEmpty)
              zos.write(rows.mkString("", "\n", "\n").getBytes("UTF-8"))
            zos.closeEntry()
          } finally zos.close()
          ctx.log("zipwrite", s"wrote ${rows.length} rows to $path!$entry")
          rows.length.toLong
        })
      }),

    Registered("column", RowType, RowType, "in=STREAM:out=STREAM:clist=a,b,c",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val clist = m.args.getOrElse("clist",
          throw new BuildError("column: clist= required")).split(",").toSeq
        ctx.writeStream(m, df.select(clist.map(col): _*), RowType)
      }),

    Registered("ndb", RowType, RowType,
      "in=STREAM[:out=STREAM]:fname=PATH:key=COL", (ctx, m) => {
        // Keyed last-write-wins store (dbitool.pl:2561-2694): dedup by
        // key, persist as keyed parquet, optionally pass through.
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("ndb: key= required"))
        val deduped = df.dropDuplicates(key)
        m.args.get("fname").foreach { f =>
          ctx.addSink(m.raw, () => {
            graft.sinks.Sinks.keyedParquet(df, f, key)
            ctx.log("ndb", s"persisted keyed table $f")
            deduped.count()
          })
        }
        if (m.args.contains("out") || m.args.get("fname").isEmpty)
          ctx.writeStream(m, deduped, RowType)
      }),

    // ----- extensions: the relational ops the reference TODO'd -----
    Registered("filter", RowType, RowType, "in=STREAM:out=STREAM:expr=SQL",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val e = m.args.getOrElse("expr", throw new BuildError("filter: expr= required"))
        ctx.writeStream(m, df.filter(e), RowType)
      }),

    Registered("select", RowType, RowType, "in=STREAM:out=STREAM:exprs=a;b+1 as c",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val es = m.args.getOrElse("exprs",
          throw new BuildError("select: exprs= required")).split(";").toSeq
        ctx.writeStream(m, df.selectExpr(es: _*), RowType)
      }),

    Registered("join", RowType, RowType,
      "in=STREAM:with=STREAM:on=k1,k2:how=inner:broadcast:out=STREAM", (ctx, m) => {
        val left = ctx.readStream(m, RowType)
        val wname = m.args.getOrElse("with", throw new BuildError("join: with= required"))
        val (right, rt) = ctx.streams.getOrElse(wname,
          throw new BuildError(s"join: unknown stream '$wname'"))
        if (rt != RowType) throw new BuildError(s"join: '$wname' is not a row stream")
        ctx.readers(wname) += 1
        val on = m.args.getOrElse("on", throw new BuildError("join: on= required"))
          .split(",").toSeq
        val how = m.args.getOrElse("how", "inner")
        val joined =
          if (m.args.contains("broadcast")) left.join(broadcast(right), on, how)
          else left.join(right, on, how)
        ctx.writeStream(m, joined, RowType)
      }),

    Registered("agg", RowType, RowType,
      "in=STREAM:by=k1,k2:exprs=sum(x) as sx;count(*) as n:out=STREAM", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val es = m.args.getOrElse("exprs",
          throw new BuildError("agg: exprs= required")).split(";").map(expr).toSeq
        val out = m.args.get("by") match {
          case Some(by) =>
            df.groupBy(by.split(",").map(col): _*).agg(es.head, es.tail: _*)
          case None => df.agg(es.head, es.tail: _*)
        }
        ctx.writeStream(m, out, RowType)
      }),

    Registered("sort", RowType, RowType, "in=STREAM:by=a,-b:out=STREAM", (ctx, m) => {
      val df = ctx.readStream(m, RowType)
      val by = m.args.getOrElse("by", throw new BuildError("sort: by= required"))
        .split(",").toSeq.map {
          case s if s.startsWith("-") => col(s.drop(1)).desc
          case s => col(s).asc
        }
      ctx.writeStream(m, df.orderBy(by: _*), RowType)
    }),

    Registered("limit", RowType, RowType, "in=STREAM:n=100:out=STREAM", (ctx, m) => {
      val df = ctx.readStream(m, RowType)
      ctx.writeStream(m, df.limit(m.args.getOrElse("n", "100").toInt), RowType)
    }),

    Registered("union", RowType, RowType, "in=STREAM:with=STREAM:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val wname = m.args.getOrElse("with", throw new BuildError("union: with= required"))
        val (right, rt) = ctx.streams.getOrElse(wname,
          throw new BuildError(s"union: unknown stream '$wname'"))
        if (rt != RowType) throw new BuildError(s"union: '$wname' is not a row stream")
        ctx.readers(wname) += 1
        ctx.writeStream(m,
          df.unionByName(right, allowMissingColumns = true), RowType)
      }),

    Registered("intervaljoin", RowType, RowType,
      "in=STREAM:with=STREAM:key=COL:within=1 hour[:type=inner|left_outer|full_outer]:out=STREAM",
      (ctx, m) => {
        // Interval join (EventStreams.intervalJoin): right rows whose
        // ts falls in [left.ts, left.ts + within] attach r_-prefixed;
        // left_outer keeps unmatched left rows (watermark-gated under
        // streaming).
        val df = ctx.readStream(m, RowType)
        val wname = m.args.getOrElse("with",
          throw new BuildError("intervaljoin: with= required"))
        val (right, rt) = ctx.streams.getOrElse(wname,
          throw new BuildError(s"intervaljoin: unknown stream '$wname'"))
        if (rt != RowType)
          throw new BuildError(s"intervaljoin: '$wname' is not a row stream")
        ctx.readers(wname) += 1
        val key = m.args.getOrElse("key",
          throw new BuildError("intervaljoin: key= required"))
        val joinType = m.args.getOrElse("type", "inner")
        val within = m.args.getOrElse("within", "1 hour")
        val out = joinType match {
          case "inner" | "left_outer" =>
            graft.streaming.EventStreams.intervalJoin(
              df, right, key, within, joinType)
          case "full_outer" =>
            graft.streaming.EventStreams.intervalJoinFullOuter(
              df, right, key, within)
          case other => throw new BuildError(
            s"intervaljoin: type must be inner, left_outer or full_outer, got '$other'")
        }
        ctx.writeStream(m, out, RowType)
      }),

    Registered("dedup", RowType, RowType, "in=STREAM:key=k1,k2:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val out = m.args.get("key") match {
          case Some(k) => df.dropDuplicates(k.split(",").toSeq)
          case None => df.dropDuplicates()
        }
        ctx.writeStream(m, out, RowType)
      }),

    // As-of join from the DSL (wraps Ops.asofJoin — union + one window
    // pass, one shuffle, no per-key quadratic). tolerance= in
    // microseconds bounds staleness.
    Registered("asofjoin", RowType, RowType,
      "in=STREAM:with=STREAM:on=k1,k2:lts=COL:rts=COL:prefix=r_:tolerance=USEC:bucket=USEC:out=STREAM",
      (ctx, m) => {
        val left = ctx.readStream(m, RowType)
        val wname = m.args.getOrElse("with",
          throw new BuildError("asofjoin: with= required"))
        val (right, rt) = ctx.streams.getOrElse(wname,
          throw new BuildError(s"asofjoin: unknown stream '$wname'"))
        if (rt != RowType) throw new BuildError(s"asofjoin: '$wname' is not a row stream")
        ctx.readers(wname) += 1
        val keys = m.args.getOrElse("on",
          throw new BuildError("asofjoin: on= required")).split(",").toSeq
        val lts = m.args.getOrElse("lts", throw new BuildError("asofjoin: lts= required"))
        val rts = m.args.getOrElse("rts", throw new BuildError("asofjoin: rts= required"))
        val prefix = m.args.getOrElse("prefix", "r_")
        val tol = m.args.get("tolerance").map(_.toLong)
        // bucket= switches to the skew-safe (key, time-bucket) variant
        // for hot-key distributions; semantics are identical.
        val out = m.args.get("bucket").map(_.toLong) match {
          case Some(b) => graft.operators.Ops.asofJoinBucketed(left, right,
            keys, lts, rts, b, rightPrefix = prefix, toleranceMicros = tol)
          case None => graft.operators.Ops.asofJoin(left, right, keys,
            lts, rts, rightPrefix = prefix, toleranceMicros = tol)
        }
        ctx.writeStream(m, out, RowType)
      }),

    // SCD Type-2 merge from the DSL (wraps Ops.scd2Apply): in= is the
    // current dimension (key, attrs, valid_from/valid_to/is_current),
    // with= the change batch (key, attrs, ts). Only batch-touched keys
    // pass the re-versioning window; the rest join-prune through.
    Registered("scd2", RowType, RowType,
      "in=STREAM:with=STREAM:key=COL:attrs=a1,a2:ts=COL[:tie=c1,c2]:out=STREAM",
      (ctx, m) => {
        val current = ctx.readStream(m, RowType)
        val wname = m.args.getOrElse("with",
          throw new BuildError("scd2: with= required"))
        val (changes, rt) = ctx.streams.getOrElse(wname,
          throw new BuildError(s"scd2: unknown stream '$wname'"))
        if (rt != RowType)
          throw new BuildError(s"scd2: '$wname' is not a row stream")
        ctx.readers(wname) += 1
        val key = m.args.getOrElse("key",
          throw new BuildError("scd2: key= required"))
        val attrs = m.args.getOrElse("attrs",
          throw new BuildError("scd2: attrs= required"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (attrs.isEmpty) throw new BuildError("scd2: attrs= is empty")
        val ts = m.args.getOrElse("ts", "ts")
        val tie = m.args.get("tie")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        ctx.writeStream(m, graft.operators.Ops.scd2Apply(
          current, changes, key, attrs, ts, tie), RowType)
      }),

    // KMV distinct sketch from the DSL: per-group (by=) distinct-count
    // estimate of key= via the bounded mergeable bottom-k aggregator.
    // Exact below k values; only k-vectors cross the shuffle.
    Registered("kmvsketch", RowType, RowType,
      "in=STREAM:key=COL[:by=g1,g2][:k=256]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("kmvsketch: key= required"))
        val k = m.args.get("k").map(_.toInt).getOrElse(256)
        if (k < 2) throw new BuildError(s"kmvsketch: k must be >= 2, got $k")
        val by = m.args.get("by")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        val kmv = org.apache.spark.sql.functions.udaf(
          new graft.functions.Aggregators.KmvSketch(k),
          org.apache.spark.sql.Encoders.scalaDouble)
        val hashed = df.withColumn("__u",
          graft.operators.Ops.kmvUnitHash(col(key)))
        val grouped =
          if (by.isEmpty) hashed.agg(kmv(col("__u")).as("__sk"))
          else hashed.groupBy(by.map(col): _*).agg(kmv(col("__u")).as("__sk"))
        ctx.writeStream(m, grouped.select((by.map(col) :+
          round(graft.operators.Ops.kmvDistinctEstimate(col("__sk"), k), 4)
            .as("est_distinct")): _*), RowType)
      }),

    // Data-quality profile (Deequ-style) from the DSL: null count,
    // exact distinct count, min, max per column — ONE scan (multi
    // count-distinct compiles to a single Expand pass), unpivoted to
    // one report row per column.
    Registered("profile", RowType, RowType,
      "in=STREAM[:cols=c1,c2]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val cols = m.args.get("cols")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(df.columns.toSeq)
        if (cols.isEmpty) throw new BuildError("profile: cols= is empty")
        val missing = cols.filterNot(df.columns.contains)
        if (missing.nonEmpty)
          throw new BuildError(s"profile: unknown columns ${missing.mkString(",")}")
        val bad = cols.filterNot(_.matches("[A-Za-z0-9_]+"))
        if (bad.nonEmpty)
          throw new BuildError(s"profile: bad column names ${bad.mkString(",")}")
        def metrics(c: String) = Seq(
          sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"null_$c"),
          countDistinct(col(c)).as(s"dist_$c"),
          min(col(c)).cast("string").as(s"min_$c"),
          max(col(c)).cast("string").as(s"max_$c"))
        val ms = cols.flatMap(metrics)
        val out = df.agg(ms.head, ms.tail: _*).selectExpr(
          s"stack(${cols.size}, " + cols.map(c =>
            s"'$c', null_$c, dist_$c, min_$c, max_$c").mkString(", ") +
            ") as (col_name, n_null, n_distinct, min_val, max_val)")
          .orderBy(col("col_name"))
        ctx.writeStream(m, out, RowType)
      }),

    // Record linkage from the DSL (wraps Linkage.jaroWinklerLinks):
    // block → pair-once → codegen Jaro-Winkler score → threshold;
    // oversized blocks dropped by the broadcast-semi guard.
    Registered("linkage", RowType, RowType,
      "in=STREAM:id=COL:text=COL:block=b1,b2[:threshold=0.85][:maxblock=65536]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val id = m.args.getOrElse("id",
          throw new BuildError("linkage: id= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("linkage: text= required"))
        val block = m.args.getOrElse("block",
          throw new BuildError("linkage: block= required"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (block.isEmpty) throw new BuildError("linkage: block= is empty")
        val th = m.args.get("threshold").map(_.toDouble).getOrElse(0.85)
        if (th < 0.0 || th > 1.0)
          throw new BuildError(s"linkage: threshold must be in [0,1], got $th")
        val mb = m.args.get("maxblock").map(_.toInt).getOrElse(1 << 16)
        if (mb < 2)
          throw new BuildError(s"linkage: maxblock must be >= 2, got $mb")
        val missing = (Seq(id, text) ++ block).filterNot(df.columns.contains)
        if (missing.nonEmpty)
          throw new BuildError(
            s"linkage: unknown columns ${missing.mkString(",")}")
        ctx.writeStream(m, graft.operators.Linkage.jaroWinklerLinks(
          df, id, text, block, th, mb), RowType)
      }),

    // Unicode NFC canonicalization in place (normalize-before-hash for
    // dedup); no-allocation fast path on already-normalized values.
    Registered("nfcnormalize", RowType, RowType,
      "in=STREAM:col=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val c = m.args.getOrElse("col",
          throw new BuildError("nfcnormalize: col= required"))
        if (!df.columns.contains(c))
          throw new BuildError(s"nfcnormalize: unknown column '$c'")
        ctx.writeStream(m, df.withColumn(c,
          graft.functions.StringSimilarity.nfcNormalize(col(c))), RowType)
      }),

    // Range (point-in-interval) join from the DSL (wraps Ops.rangeJoin
    // — bucketed equi-join, never points × intervals).
    Registered("rangejoin", RowType, RowType,
      "in=STREAM:with=STREAM:on=k1:pts=COL:start=COL:end=COL:bucket=USEC:how=inner:out=STREAM",
      (ctx, m) => {
        val points = ctx.readStream(m, RowType)
        val wname = m.args.getOrElse("with",
          throw new BuildError("rangejoin: with= required"))
        val (intervals, rt) = ctx.streams.getOrElse(wname,
          throw new BuildError(s"rangejoin: unknown stream '$wname'"))
        if (rt != RowType) throw new BuildError(s"rangejoin: '$wname' is not a row stream")
        ctx.readers(wname) += 1
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"rangejoin: $k= required"))
        ctx.writeStream(m, graft.operators.Ops.rangeJoin(points, intervals,
          req("on").split(",").toSeq, req("pts"), req("start"), req("end"),
          bucketMicros = req("bucket").toLong,
          how = m.args.getOrElse("how", "inner")), RowType)
      }),

    // Fuzzy near-dedup from the DSL: MinHash-LSH pairs + keep-smallest-
    // id drop (wraps Dedup — banded equi-join candidates, exact verify,
    // never all-pairs). method picks the fingerprint family (MinHash-
    // LSH on word shingles / SimHash hamming / winnowing substring
    // fingerprints); hash=md5 selects the portable variants (every
    // hash replayable in external SQL engines — see DedupPortable),
    // xx(hash64) the throughput default. Same banding, hub cut and
    // exact verification in all six combinations (shared with
    // dedupcluster via nearDupPairSource).
    Registered("dedupnear", RowType, RowType,
      "in=STREAM:key=COL:text=COL:method=minhash|simhash|winnow|containment|prefix:threshold=0.8:maxdist=3:k=3:hash=xx|md5:transitive:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("dedupnear: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("dedupnear: text= required"))
        val pairs = nearDupPairSource(df, key, text, m)
        // transitive: connected-components clustering keeps ONE doc per
        // duplicate cluster (A~B, B~C drops both B and C even though
        // the pair (A,C) was never emitted); default is the greedy
        // pair-drop policy.
        val deduped =
          if (m.args.contains("transitive"))
            graft.operators.Dedup.dropDuplicatesByClusters(df, key,
              graft.operators.Dedup.duplicateClusters(pairs))
          else graft.operators.Dedup.dropDuplicatesByPairs(df, key, pairs)
        ctx.writeStream(m, deduped, RowType)
      }),

    // Full clustering from the DSL (VERDICT r9 #5 — the DSL used to
    // stop at dedupnear's drop policy): emits the (id, rep) cluster
    // assignment for EVERY input row, singletons as their own rep —
    // the q147 composition (banded pair source → alternating-star
    // connected components → singleton anti-join) as a module, for
    // chains that need the clusters themselves (survivor, reporting).
    Registered("dedupcluster", RowType, RowType,
      "in=STREAM:key=COL:text=COL:method=minhash|simhash|winnow|containment|prefix:threshold=0.8:maxdist=3:k=3:hash=xx|md5:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("dedupcluster: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("dedupcluster: text= required"))
        ctx.writeStream(m, graft.operators.Dedup.clusterAssignments(
          df, key, nearDupPairSource(df, key, text, m)), RowType)
      }),

    // Incremental (daily-crawl) dedup from the DSL: in= the standing
    // corpus, delta= today's batch; emits per-delta-doc verdicts
    // (id, status, dup_of, n_corpus, n_delta, best_score). The corpus
    // never reshuffles — delta-keyed pruning does the work.
    // method=minhash (near-dup, xxhash hot path) or containment
    // (doc-in-doc). Ids must be disjoint across corpus and delta (the
    // operator contract).
    Registered("incdedup", RowType, RowType,
      "in=STREAM:delta=STREAM:key=COL:text=COL:method=minhash|containment:threshold=0.7:k=3:maxbucket=64:out=STREAM",
      (ctx, m) => {
        val corpus = ctx.readStream(m, RowType)
        val dname = m.args.getOrElse("delta",
          throw new BuildError("incdedup: delta= required"))
        val (delta, dt) = ctx.streams.getOrElse(dname,
          throw new BuildError(s"incdedup: unknown stream '$dname'"))
        if (dt != RowType)
          throw new BuildError(s"incdedup: '$dname' is not a row stream")
        ctx.readers(dname) += 1
        val key = m.args.getOrElse("key",
          throw new BuildError("incdedup: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("incdedup: text= required"))
        val threshold = m.args.getOrElse("threshold", "0.7").toDouble
        val k = m.args.getOrElse("k", "3").toInt
        val maxBucket = m.args.getOrElse("maxbucket", "64").toInt
        val out = m.args.getOrElse("method", "minhash") match {
          case "minhash" => graft.operators.Dedup.incrementalMinhash(
            corpus, delta, key, text, k = k, threshold = threshold,
            maxBucket = maxBucket)
          case "containment" => graft.operators.Dedup.incrementalContainment(
            corpus, delta, key, text, k = k, threshold = threshold,
            maxBucket = maxBucket)
          case other => throw new BuildError(
            s"incdedup: method=$other (methods: minhash, containment)")
        }
        ctx.writeStream(m, out, RowType)
      }),

    // Cluster survivorship from the DSL: keep the best-quality member
    // per cluster (ties to smallest key), annotated with rep + family
    // size. clusters= takes a dedupcluster output stream; quality= a
    // numeric column, or omit it to score text= with the built-in
    // quality heuristic. The keeper pick is the salted skew-safe top-1
    // (Dedup.survivors) — q148's scale path as a module.
    Registered("survivor", RowType, RowType,
      "in=STREAM:clusters=STREAM:key=COL:quality=COL|text=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val cname = m.args.getOrElse("clusters",
          throw new BuildError("survivor: clusters= required"))
        val (clusters, ct) = ctx.streams.getOrElse(cname,
          throw new BuildError(s"survivor: unknown stream '$cname'"))
        if (ct != RowType)
          throw new BuildError(s"survivor: '$cname' is not a row stream")
        ctx.readers(cname) += 1
        val key = m.args.getOrElse("key",
          throw new BuildError("survivor: key= required"))
        val quality = m.args.get("quality").map(col).getOrElse {
          val text = m.args.getOrElse("text", throw new BuildError(
            "survivor: quality= or text= required"))
          graft.functions.TextFunctions.qualityScore(col(text))
        }
        ctx.writeStream(m,
          graft.operators.Dedup.survivors(df, key, quality, clusters),
          RowType)
      }),

    // Per-doc n-gram novelty vs a standing corpus stream (q256): the
    // crawl freshness / dedup-pressure report.
    Registered("novelty", RowType, RowType,
      "in=STREAM:ref=STREAM:key=COL:text=COL[:k=5]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val rname = m.args.getOrElse("ref",
          throw new BuildError("novelty: ref= required"))
        val (ref, rt) = ctx.streams.getOrElse(rname,
          throw new BuildError(s"novelty: unknown stream '$rname'"))
        if (rt != RowType)
          throw new BuildError(s"novelty: '$rname' is not a row stream")
        ctx.readers(rname) += 1
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"novelty: $k= required"))
        ctx.writeStream(m, graft.operators.Curation.ngramNovelty(
          df, ref, req("key"), req("text"),
          m.args.getOrElse("k", "5").toInt), RowType)
      }),

    // robots.txt-aware crawl-frontier filtering (q261, RFC 9309):
    // parse the robots stream's bodies into a rule table for agent=,
    // verdict each URL row by longest-match / allow-wins-ties.
    Registered("robotsfilter", RowType, RowType,
      "in=STREAM:robots=STREAM:agent=STR:key=COL:host=COL:path=COL" +
        ":rhost=COL:content=COL:out=STREAM",
      (ctx, m) => {
        val urls = ctx.readStream(m, RowType)
        val rname = m.args.getOrElse("robots",
          throw new BuildError("robotsfilter: robots= required"))
        val (rob, rt) = ctx.streams.getOrElse(rname,
          throw new BuildError(s"robotsfilter: unknown stream '$rname'"))
        if (rt != RowType)
          throw new BuildError(s"robotsfilter: '$rname' is not a row stream")
        ctx.readers(rname) += 1
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"robotsfilter: $k= required"))
        // rules carry their host under the ROBOTS stream's column
        // name; robotsFilter resolves the host on BOTH sides by the
        // urls name — rename so rhost= != host= actually works
        val rhost = m.args.getOrElse("rhost", req("host"))
        val rules = graft.operators.Curation.robotsRules(rob,
          rhost, req("content"), req("agent"))
          .withColumnRenamed(rhost, req("host"))
        ctx.writeStream(m, graft.operators.Curation.robotsFilter(
          urls, req("key"), req("host"), req("path"), rules), RowType)
      }),

    // Sitemap declarations from robots bodies (q262) — the seed-list
    // half of the crawl-loop feedback.
    Registered("sitemaps", RowType, RowType,
      "in=STREAM:host=COL:content=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"sitemaps: $k= required"))
        ctx.writeStream(m, graft.operators.Curation.robotsSitemaps(
          df, req("host"), req("content")), RowType)
      }),

    // Full sitemap-entry parse with freshness fields (q276):
    // loc/lastmod/changefreq/priority per <url>/<sitemap> block — the
    // declared-freshness seed for crawlschedule.
    Registered("sitemapentries", RowType, RowType,
      "in=STREAM:host=COL:xml=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"sitemapentries: $k= required"))
        ctx.writeStream(m, graft.operators.Curation.sitemapEntries(
          df, req("host"), req("xml")), RowType)
      }),

    // Outlink extraction (q258/q260's anchor-href contract): one row
    // per <a href="..."> per page, document order — the stage between
    // fetched HTML and the robots gate / host link graph. html= may
    // be a binary column (warcread payloads): cast is the UTF-8
    // decode. Narrow kernel map + explode; zero shuffles.
    Registered("outlinks", RowType, RowType,
      "in=STREAM:html=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val h = m.args.getOrElse("html",
          throw new BuildError("outlinks: html= required"))
        if (!df.columns.contains(h))
          throw new BuildError(s"outlinks: no column '$h'")
        val keep = df.columns.filterNot(_ == h).map(col).toSeq
        ctx.writeStream(m, df.select(keep :+ explode(
          graft.functions.HtmlExpr.anchorHrefs(col(h).cast("string")))
            .as("href"): _*), RowType)
      }),

    // Anchor-text extraction (q287, Curation.anchorTexts): one row
    // per <a> occurrence with (href, normalized inner text) — the
    // retrieval-training / title-surrogate signal mined from the
    // same anchor pass as the frontier. id= names the page-identity
    // column carried through.
    Registered("anchortexts", RowType, RowType,
      "in=STREAM:id=COL:html=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"anchortexts: $k= required"))
        val (id, h) = (req("id"), req("html"))
        for (c <- Seq(id, h))
          if (!df.columns.contains(c))
            throw new BuildError(s"anchortexts: no column '$c'")
        ctx.writeStream(m, graft.operators.Curation.anchorTexts(
          df.withColumn(h, col(h).cast("string")), id, h), RowType)
      }),

    // Crawl-delay politeness extraction (q264): per-host minimum
    // delay across the agent's chosen robots groups (RFC 9309 parse,
    // de-facto Crawl-delay extension).
    Registered("crawldelays", RowType, RowType,
      "in=STREAM:agent=STR:host=COL:content=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"crawldelays: $k= required"))
        ctx.writeStream(m, graft.operators.Curation.robotsCrawlDelays(
          df, req("host"), req("content"), req("agent")), RowType)
      }),

    // Politeness-paced frontier schedule (q266): the ranked frontier
    // stream × the delays= stream's per-host Crawl-delay budgets →
    // per-host fetch slots of the next horizonms window, pure integer
    // arithmetic (Curation.crawlSchedule).
    Registered("crawlschedule", RowType, RowType,
      "in=STREAM:delays=STREAM:host=COL:rank=COL:delay=COL" +
        ":horizonms=60000:defaultdelayms=5000:out=STREAM",
      (ctx, m) => {
        val frontier = ctx.readStream(m, RowType)
        val dname = m.args.getOrElse("delays",
          throw new BuildError("crawlschedule: delays= required"))
        val (dl, dt) = ctx.streams.getOrElse(dname,
          throw new BuildError(s"crawlschedule: unknown stream '$dname'"))
        if (dt != RowType)
          throw new BuildError(s"crawlschedule: '$dname' is not a row stream")
        ctx.readers(dname) += 1
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"crawlschedule: $k= required"))
        ctx.writeStream(m, graft.operators.Curation.crawlSchedule(
          frontier, req("host"), req("rank"), dl, req("delay"),
          m.args.getOrElse("horizonms", "60000").toLong,
          m.args.getOrElse("defaultdelayms", "5000").toLong), RowType)
      }),

    // Frontier seen-set filter (q277): exact anti join against a
    // standing seen relation with Ops.bloomAntiJoin's
    // no-false-negative bloom bypass — the crawl loop's
    // re-discovery gate (outlinks → seenfilter → robotsfilter →
    // crawlschedule).
    Registered("seenfilter", RowType, RowType,
      "in=STREAM:seen=STREAM:key=COL:on=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val sname = m.args.getOrElse("seen",
          throw new BuildError("seenfilter: seen= required"))
        val (sd, st) = ctx.streams.getOrElse(sname,
          throw new BuildError(s"seenfilter: unknown stream '$sname'"))
        if (st != RowType)
          throw new BuildError(s"seenfilter: '$sname' is not a row stream")
        ctx.readers(sname) += 1
        val key = m.args.getOrElse("key",
          throw new BuildError("seenfilter: key= required"))
        val on = m.args.getOrElse("on", key)
        if (!df.columns.contains(key))
          throw new BuildError(s"seenfilter: no column '$key'")
        if (!sd.columns.contains(on))
          throw new BuildError(s"seenfilter: seen stream has no column '$on'")
        ctx.writeStream(m,
          graft.operators.Ops.bloomAntiJoin(df, key, sd, on), RowType)
      }),

    // Registrable-domain (eTLD+1) annotation (q290,
    // Curation.registrableDomain): public_suffix/reg_domain columns
    // from a host column under publicsuffix.org rule semantics; the
    // rule stream (first column = raw PSL line) is bounded side data
    // compiled into the codegen kernel — narrow pass, zero joins.
    Registered("regdomain", RowType, RowType,
      "in=STREAM:host=COL:rules=STREAM[:ps=public_suffix]" +
        "[:rd=reg_domain]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val h = m.args.getOrElse("host",
          throw new BuildError("regdomain: host= required"))
        if (!df.columns.contains(h))
          throw new BuildError(s"regdomain: no column '$h'")
        val rname = m.args.getOrElse("rules",
          throw new BuildError("regdomain: rules= required"))
        val (rd, rt) = ctx.streams.getOrElse(rname,
          throw new BuildError(s"regdomain: unknown stream '$rname'"))
        if (rt != RowType)
          throw new BuildError(s"regdomain: '$rname' is not a row stream")
        ctx.readers(rname) += 1
        ctx.writeStream(m,
          graft.operators.Curation.registrableDomain(df, h, rd,
            m.args.getOrElse("ps", "public_suffix"),
            m.args.getOrElse("rd", "reg_domain")), RowType)
      }),

    // Atomic first-fit bin packing (q285, Ops.binPack): docs into
    // fixed token-budget training contexts — md5-sharded, first-fit
    // in ascending-id order, docs never split, bins never overflow
    // (vs `seqpack`, the cumulative-offset regime where a doc may
    // straddle two bins). Deterministic under any input partitioning.
    // Output adds (shard, bin); a context is (shard, bin).
    Registered("binpack", RowType, RowType,
      "in=STREAM:id=COL:tokens=COL:budget=N[:shards=8]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"binpack: $k= required"))
        val (id, toks) = (req("id"), req("tokens"))
        for (c <- Seq(id, toks))
          if (!df.columns.contains(c))
            throw new BuildError(s"binpack: no column '$c'")
        val budget = req("budget").toLong
        if (budget <= 0) throw new BuildError("binpack: budget= must be >= 1")
        val shards = m.args.getOrElse("shards", "8").toInt
        if (shards <= 0) throw new BuildError("binpack: shards= must be >= 1")
        ctx.writeStream(m,
          graft.operators.Ops.binPack(df, id, toks, budget, shards), RowType)
      }),

    // Per-URL change-rate estimate from a capture index (q275): the
    // recrawl-priority signal — digest changes over observation
    // intervals, exact integers (rate_e6 composes into
    // crawlschedule's rank by cross-multiplication). Chain:
    // warcread → cdxindex → changerate → crawlschedule.
    Registered("changerate", RowType, RowType,
      "in=STREAM:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        for (c <- Seq("urlkey", "ts14", "digest"))
          if (!df.columns.contains(c))
            throw new BuildError(s"changerate: input lacks column '$c' " +
              "(expects a cdxindex stream)")
        ctx.writeStream(m, graft.operators.Curation.changeRate(df), RowType)
      }),

    // Per-group Jensen-Shannon divergence vs the whole input (q254).
    Registered("jsd", RowType, RowType,
      "in=STREAM:group=COL:text=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"jsd: $k= required"))
        ctx.writeStream(m, graft.operators.Curation.unigramJsd(
          df, req("group"), req("text")), RowType)
      }),

    // Chao1 vocabulary-richness estimator per group (q253).
    Registered("chao1", RowType, RowType,
      "in=STREAM:group=COL:text=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"chao1: $k= required"))
        ctx.writeStream(m, graft.operators.Curation.chao1Richness(
          df, req("group"), req("text")), RowType)
      }),

    Registered("decontaminate", RowType, RowType,
      "in=STREAM:eval=STREAM:key=COL:text=COL:k=3:minshared=4:mode=drop|flag:out=STREAM",
      (ctx, m) => {
        // Benchmark decontamination (Curation.decontaminate): drop (or
        // flag) training rows whose word-k-shingle overlap with the
        // eval stream crosses minshared. The eval stream is broadcast —
        // it is the benchmark set, small by nature.
        val train = ctx.readStream(m, RowType)
        val ename = m.args.getOrElse("eval",
          throw new BuildError("decontaminate: eval= required"))
        val (eval, et) = ctx.streams.getOrElse(ename,
          throw new BuildError(s"decontaminate: unknown stream '$ename'"))
        if (et != RowType)
          throw new BuildError(s"decontaminate: '$ename' is not a row stream")
        ctx.readers(ename) += 1
        val key = m.args.getOrElse("key",
          throw new BuildError("decontaminate: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("decontaminate: text= required"))
        val k = m.args.getOrElse("k", "3").toInt
        val minShared = m.args.getOrElse("minshared", "4").toLong
        val stats = graft.operators.Curation
          .decontaminate(train, eval, key, text, k, minShared)
        val out = m.args.getOrElse("mode", "drop") match {
          case "flag" => stats
          case "drop" => train.join(
            broadcast(stats.filter(col("contaminated")).select(col(key))),
            Seq(key), "left_anti")
          case other => throw new BuildError(
            s"decontaminate: mode must be drop|flag, got $other")
        }
        ctx.writeStream(m, out, RowType)
      }),

    Registered("mixsample", RowType, RowType,
      "in=STREAM:domain=COL:key=COL:target=N:alpha=A:out=STREAM", (ctx, m) => {
        // Deterministic mixture rebalancing: keep ~target rows per
        // domain value via an md5 draw on key. With alpha=, target is
        // the TOTAL row budget shared across domains by temperature-
        // weighted shares n^alpha (Curation.temperatureRebalance);
        // without it, target is per-domain (equal shares).
        val df = ctx.readStream(m, RowType)
        val dom = m.args.getOrElse("domain",
          throw new BuildError("mixsample: domain= required"))
        val key = m.args.getOrElse("key",
          throw new BuildError("mixsample: key= required"))
        val target = m.args.getOrElse("target",
          throw new BuildError("mixsample: target= required")).toLong
        val out = m.args.get("alpha") match {
          case Some(a) => graft.operators.Curation
            .temperatureRebalance(df, dom, key, target, a.toDouble)
          case None => graft.operators.Curation
            .rebalanceSample(df, dom, key, target)
        }
        ctx.writeStream(m, out, RowType)
      }),

    Registered("hashsplit", RowType, RowType,
      "in=STREAM:key=COL:weights=train=0.8,val=0.1,test=0.1[:salt=S][:col=split]:out=STREAM",
      (ctx, m) => {
        // Deterministic split assignment (Ops.hashSplit): adds a split
        // column from portable md5 cumulative thresholds.
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("hashsplit: key= required"))
        val weights = m.args.getOrElse("weights",
            throw new BuildError("hashsplit: weights= required"))
          .split(",").toSeq.map { kv =>
            kv.split("=") match {
              case Array(n, w) => n -> w.toDouble
              case _ => throw new BuildError(
                s"hashsplit: bad weights entry '$kv' (want name=frac)")
            }
          }
        val out = graft.operators.Ops.hashSplit(df, key, weights,
          salt = m.args.getOrElse("salt", ""),
          splitName = m.args.getOrElse("col", "split"))
        ctx.writeStream(m, out, RowType)
      }),

    // Leakage-safe split (q209): same md5 thresholds as hashsplit, but
    // every row routes by its duplicate-cluster REP from a
    // dedupcluster-shaped stream (id, rep) — near-dups can never
    // straddle train/val/test. Rows without a cluster row route by
    // their own key (singleton = its own rep).
    Registered("safesplit", RowType, RowType,
      "in=STREAM:clusters=STREAM:key=COL:weights=train=0.8,val=0.1,test=0.1[:salt=S][:col=split]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val cname = m.args.getOrElse("clusters",
          throw new BuildError("safesplit: clusters= required"))
        val (clusters, ct) = ctx.streams.getOrElse(cname,
          throw new BuildError(s"safesplit: unknown stream '$cname'"))
        if (ct != RowType)
          throw new BuildError(s"safesplit: '$cname' is not a row stream")
        ctx.readers(cname) += 1
        val key = m.args.getOrElse("key",
          throw new BuildError("safesplit: key= required"))
        val weights = m.args.getOrElse("weights",
            throw new BuildError("safesplit: weights= required"))
          .split(",").toSeq.map { kv =>
            kv.split("=") match {
              case Array(n, w) => n -> w.toDouble
              case _ => throw new BuildError(
                s"safesplit: bad weights entry '$kv' (want name=frac)")
            }
          }
        val withRep = df
          .join(clusters.select(col("id").as(key), col("rep").as("__rep")),
            Seq(key), "left")
          .withColumn("__rep", coalesce(col("__rep"), col(key)))
        val out = graft.operators.Ops.hashSplit(withRep, "__rep", weights,
            salt = m.args.getOrElse("salt", ""),
            splitName = m.args.getOrElse("col", "split"))
          .drop("__rep")
        ctx.writeStream(m, out, RowType)
      }),

    // Release-manifest module (q214 / Ops.shardManifest): per-shard
    // rows, token budget, and the order-invariant exact content
    // fingerprint — the integrity record a dataset release ships with.
    Registered("manifest", RowType, RowType,
      "in=STREAM:key=COL:text=COL:shards=8[:salt=S:update=STREAM]:out=STREAM",
      (ctx, m) => {
        // update= names a STANDING manifest stream: the input is then
        // treated as a DELTA batch and folded in exactly
        // (Ops.manifestUpdate, q239) — the daily-release loop without
        // rescanning the archive.
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("manifest: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("manifest: text= required"))
        val shards = m.args.getOrElse("shards", "8").toInt
        if (shards < 1)
          throw new BuildError(s"manifest: shards must be >= 1, got $shards")
        val salt = m.args.getOrElse("salt", "")
        val out = m.args.get("update") match {
          case None => graft.operators.Ops.shardManifest(
            df, key, text, shards, salt)
          case Some(uname) =>
            val (standing, ut) = ctx.streams.getOrElse(uname,
              throw new BuildError(s"manifest: unknown stream '$uname'"))
            if (ut != RowType)
              throw new BuildError(s"manifest: '$uname' is not a row stream")
            ctx.readers(uname) += 1
            graft.operators.Ops.manifestUpdate(standing, df, key, text,
              shards, salt)
        }
        ctx.writeStream(m, out, RowType)
      }),

    Registered("lmscore", RowType, RowType,
      "in=SCORE:train=STREAM:key=COL:text=COL[:k=0.5:ngram=word|char" +
        ":smoothing=addk|kn:discount=0.75]:out=STREAM",
      (ctx, m) => {
        // CCNet-style LM quality filter (q234 q246): smoothed-bigram
        // cross-entropy of each doc against a reference corpus; emits
        // (key, n_bigrams, xent). ngram=char for unsegmented scripts;
        // smoothing=kn switches add-k (bigramCrossEntropy) to
        // interpolated Kneser-Ney (kneserNeyCrossEntropy — k then
        // smooths the continuation distribution).
        val df = ctx.readStream(m, RowType)
        val tname = m.args.getOrElse("train",
          throw new BuildError("lmscore: train= required"))
        val (tr, tt) = ctx.streams.getOrElse(tname,
          throw new BuildError(s"lmscore: unknown stream '$tname'"))
        if (tt != RowType)
          throw new BuildError(s"lmscore: '$tname' is not a row stream")
        ctx.readers(tname) += 1
        def req(a: String) = m.args.getOrElse(a,
          throw new BuildError(s"lmscore: $a= required"))
        val k = m.args.getOrElse("k", "0.5").toDouble
        if (k <= 0) throw new BuildError(s"lmscore: k must be > 0, got $k")
        val ngram = m.args.getOrElse("ngram", "word")
        if (ngram != "word" && ngram != "char")
          throw new BuildError(s"lmscore: ngram must be word or char, got $ngram")
        val smoothing = m.args.getOrElse("smoothing", "addk")
        val out = smoothing match {
          case "addk" => graft.operators.Curation.bigramCrossEntropy(
            tr, df, req("key"), req("text"), k, ngram)
          case "kn" => graft.operators.Curation.kneserNeyCrossEntropy(
            tr, df, req("key"), req("text"),
            m.args.getOrElse("discount", "0.75").toDouble, k, ngram)
          case other => throw new BuildError(
            s"lmscore: smoothing must be addk or kn, got $other")
        }
        ctx.writeStream(m, out, RowType)
      }),

    Registered("lmlangid", RowType, RowType,
      "in=SCORE:train=STREAM:label=COL:key=COL:text=COL[:k=0.5:ngram=word|char]:out=STREAM",
      (ctx, m) => {
        // Statistical language ID (q235 q236 / Curation.bigramLangId):
        // per-label bigram LMs, exact-decimal argmin cross-entropy;
        // emits (key, pred, xent). ngram=char for unsegmented scripts.
        val df = ctx.readStream(m, RowType)
        val tname = m.args.getOrElse("train",
          throw new BuildError("lmlangid: train= required"))
        val (tr, tt) = ctx.streams.getOrElse(tname,
          throw new BuildError(s"lmlangid: unknown stream '$tname'"))
        if (tt != RowType)
          throw new BuildError(s"lmlangid: '$tname' is not a row stream")
        ctx.readers(tname) += 1
        def req(a: String) = m.args.getOrElse(a,
          throw new BuildError(s"lmlangid: $a= required"))
        val k = m.args.getOrElse("k", "0.5").toDouble
        if (k <= 0) throw new BuildError(s"lmlangid: k must be > 0, got $k")
        val ngram = m.args.getOrElse("ngram", "word")
        if (ngram != "word" && ngram != "char")
          throw new BuildError(s"lmlangid: ngram must be word or char, got $ngram")
        ctx.writeStream(m, graft.operators.Curation.bigramLangId(
          tr, req("label"), df, req("key"), req("text"), k, ngram), RowType)
      }),

    Registered("dsir", RowType, RowType,
      "in=RAWPOOL:target=STREAM:key=COL:text=COL:k=N[:buckets=4096:ngram=word|char]:out=STREAM",
      (ctx, m) => {
        // DSIR importance resampling (q240 / Curation.dsirSelect):
        // hashed-bigram log-ratio weights vs the target stream,
        // deterministic Gumbel-top-k of the raw pool; emits
        // (key, n_feat, logw, score, rk). Target ids never emit.
        val df = ctx.readStream(m, RowType)
        val tname = m.args.getOrElse("target",
          throw new BuildError("dsir: target= required"))
        val (tr, tt) = ctx.streams.getOrElse(tname,
          throw new BuildError(s"dsir: unknown stream '$tname'"))
        if (tt != RowType)
          throw new BuildError(s"dsir: '$tname' is not a row stream")
        ctx.readers(tname) += 1
        def req(a: String) = m.args.getOrElse(a,
          throw new BuildError(s"dsir: $a= required"))
        val key = req("key"); val text = req("text")
        val k = req("k").toInt
        if (k < 1) throw new BuildError(s"dsir: k must be >= 1, got $k")
        val buckets = m.args.getOrElse("buckets", "4096").toInt
        if (buckets < 2)
          throw new BuildError(s"dsir: buckets must be >= 2, got $buckets")
        val ngram = m.args.getOrElse("ngram", "word")
        if (ngram != "word" && ngram != "char")
          throw new BuildError(s"dsir: ngram must be word or char, got $ngram")
        val both = tr.select(col(key), col(text))
          .withColumn("__dsir_tgt", lit(true))
          .unionByName(df.select(col(key), col(text))
            .withColumn("__dsir_tgt", lit(false)))
        ctx.writeStream(m, graft.operators.Curation.dsirSelect(
          both, key, text, col("__dsir_tgt"), k, buckets, ngram), RowType)
      }),

    Registered("mlscore", RowType, RowType,
      "in=SCORE:target=STREAM:pool=STREAM:key=COL:text=COL[:k=0.5:ngram=word|char]:out=STREAM",
      (ctx, m) => {
        // Moore-Lewis cross-entropy difference (q243 /
        // Curation.mooreLewisScore): mls = xent_pool - xent_target;
        // emits (key, n_bigrams, xent_target, xent_raw, mls).
        val df = ctx.readStream(m, RowType)
        def stream(a: String) = {
          val n = m.args.getOrElse(a,
            throw new BuildError(s"mlscore: $a= required"))
          val (s, t) = ctx.streams.getOrElse(n,
            throw new BuildError(s"mlscore: unknown stream '$n'"))
          if (t != RowType)
            throw new BuildError(s"mlscore: '$n' is not a row stream")
          ctx.readers(n) += 1
          s
        }
        val tr = stream("target"); val pool = stream("pool")
        def req(a: String) = m.args.getOrElse(a,
          throw new BuildError(s"mlscore: $a= required"))
        val k = m.args.getOrElse("k", "0.5").toDouble
        if (k <= 0) throw new BuildError(s"mlscore: k must be > 0, got $k")
        val ngram = m.args.getOrElse("ngram", "word")
        if (ngram != "word" && ngram != "char")
          throw new BuildError(s"mlscore: ngram must be word or char, got $ngram")
        ctx.writeStream(m, graft.operators.Curation.mooreLewisScore(
          tr, pool, df, req("key"), req("text"), k, ngram), RowType)
      }),

    Registered("pplbuckets", RowType, RowType,
      "in=SCORE:train=STREAM:label=COL:key=COL:text=COL[:k=0.5:ngram=word|char]:out=STREAM",
      (ctx, m) => {
        // CCNet perplexity tertiles (q241 /
        // Curation.perplexityBuckets): per-label bigram LMs, each doc
        // scored against its OWN label, head/middle/tail at
        // histogram-exact tertile cutoffs; emits
        // (key, label, xent, ppl_bucket).
        val df = ctx.readStream(m, RowType)
        val tname = m.args.getOrElse("train",
          throw new BuildError("pplbuckets: train= required"))
        val (tr, tt) = ctx.streams.getOrElse(tname,
          throw new BuildError(s"pplbuckets: unknown stream '$tname'"))
        if (tt != RowType)
          throw new BuildError(s"pplbuckets: '$tname' is not a row stream")
        ctx.readers(tname) += 1
        def req(a: String) = m.args.getOrElse(a,
          throw new BuildError(s"pplbuckets: $a= required"))
        val k = m.args.getOrElse("k", "0.5").toDouble
        if (k <= 0) throw new BuildError(s"pplbuckets: k must be > 0, got $k")
        val ngram = m.args.getOrElse("ngram", "word")
        if (ngram != "word" && ngram != "char")
          throw new BuildError(s"pplbuckets: ngram must be word or char, got $ngram")
        ctx.writeStream(m, graft.operators.Curation.perplexityBuckets(
          tr, req("label"), df, req("key"), req("label"), req("text"),
          k, ngram), RowType)
      }),

    Registered("pca", RowType, RowType,
      "in=EMB:vec=COL[:mode=top|resid:key=COL:iters=10]:out=STREAM",
      (ctx, m) => {
        // Distributed PCA (q242/q244 / Similarity.pcaTopComponent,
        // removeTopComponent): mode=top emits (dim, loading,
        // eigenvalue); mode=resid (key= required) emits
        // (key, proj, resid) — all-but-the-top post-processing.
        val df = ctx.readStream(m, RowType)
        def req(a: String) = m.args.getOrElse(a,
          throw new BuildError(s"pca: $a= required"))
        val iters = m.args.getOrElse("iters", "10").toInt
        if (iters < 1 || iters > 64)
          throw new BuildError(s"pca: iters must be in [1,64], got $iters")
        val out = m.args.getOrElse("mode", "top") match {
          case "top" =>
            graft.operators.Similarity.pcaTopComponent(df, req("vec"), iters)
          case "resid" =>
            graft.operators.Similarity.removeTopComponent(
              df, req("key"), req("vec"), iters)
          case other =>
            throw new BuildError(s"pca: mode must be top or resid, got $other")
        }
        ctx.writeStream(m, out, RowType)
      }),

    Registered("bootstrap", RowType, RowType,
      "in=STREAM:key=COL:diff=COL[:resamples=200:salt=S]:out=STREAM",
      (ctx, m) => {
        // Paired Poissonized-bootstrap significance test (q233 /
        // Drift.bootstrapDiff): per-item metric difference in diff=,
        // deterministic md5 Poisson(1) resamples; emits one row
        // (resamples, total_diff, n_pos, n_zero, n_neg, frac_pos).
        val df = ctx.readStream(m, RowType)
        def req(a: String) = m.args.getOrElse(a,
          throw new BuildError(s"bootstrap: $a= required"))
        val r = m.args.getOrElse("resamples", "200").toInt
        if (r < 1 || r > 100000)
          throw new BuildError(s"bootstrap: resamples in [1,100000], got $r")
        ctx.writeStream(m, graft.operators.Drift.bootstrapDiff(
          df, req("key"), col(req("diff")), r,
          m.args.getOrElse("salt", "")), RowType)
      }),

    Registered("bm25", RowType, RowType,
      "in=DOCS:queries=STREAM:key=COL:text=COL:qkey=COL:qtext=COL" +
        "[:k=10:k1=1.2:b=0.75:maxdf=0.5]:out=STREAM",
      (ctx, m) => {
        // BM25 sparse-retrieval top-k (q232 / Curation.bm25TopK): the
        // lexical candidate pool generator for rrf / decontamination /
        // hard-negative mining. Emits (qkey, rk, key, score).
        val docs = ctx.readStream(m, RowType)
        val qname = m.args.getOrElse("queries",
          throw new BuildError("bm25: queries= required"))
        val (qs, qt) = ctx.streams.getOrElse(qname,
          throw new BuildError(s"bm25: unknown stream '$qname'"))
        if (qt != RowType)
          throw new BuildError(s"bm25: '$qname' is not a row stream")
        ctx.readers(qname) += 1
        def req(a: String) = m.args.getOrElse(a,
          throw new BuildError(s"bm25: $a= required"))
        val k = m.args.getOrElse("k", "10").toInt
        val maxDf = m.args.getOrElse("maxdf", "0.5").toDouble
        ctx.writeStream(m, graft.operators.Curation.bm25TopK(
          docs, req("key"), req("text"), qs, req("qkey"), req("qtext"),
          k = k, k1 = m.args.getOrElse("k1", "1.2").toDouble,
          b = m.args.getOrElse("b", "0.75").toDouble,
          maxDfFrac = maxDf), RowType)
      }),

    Registered("manifestdiff", RowType, RowType,
      "in=NEW_MANIFEST:old=OLD_MANIFEST:out=STREAM",
      (ctx, m) => {
        // Release-gate diff of two `manifest` outputs (q231 /
        // Ops.manifestDiff): per shard added/removed/changed/unchanged
        // with exact row/token deltas. Joins two nShards-row
        // relations — the data itself never rescans.
        val newM = ctx.readStream(m, RowType)
        val oname = m.args.getOrElse("old",
          throw new BuildError("manifestdiff: old= required"))
        val (oldM, ot) = ctx.streams.getOrElse(oname,
          throw new BuildError(s"manifestdiff: unknown stream '$oname'"))
        if (ot != RowType)
          throw new BuildError(s"manifestdiff: '$oname' is not a row stream")
        ctx.readers(oname) += 1
        ctx.writeStream(m, graft.operators.Ops.manifestDiff(oldM, newM),
          RowType)
      }),

    Registered("assignids", RowType, RowType,
      "in=STREAM:order=COL[,COL...][:col=row_id]:out=STREAM", (ctx, m) => {
        // Contiguous global ids in the given total order (Ops.assignIds
        // — range partition + zipWithIndex, never a single-task window).
        val df = ctx.readStream(m, RowType)
        val order = m.args.getOrElse("order",
            throw new BuildError("assignids: order= required"))
          .split(",").toSeq.map(c => col(c.trim))
        val out = graft.operators.Ops.assignIds(df, order,
          idName = m.args.getOrElse("col", "row_id"))
        ctx.writeStream(m, out, RowType)
      }),

    Registered("segdedup", RowType, RowType,
      "in=STREAM:key=COL:text=COL[:tokens=20]:out=STREAM", (ctx, m) => {
        // Exact segment-level dedup (Curation.segmentDedup): first
        // global occurrence of each fixed-window token segment wins;
        // emits (id, n_segs, n_kept, retained).
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("segdedup: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("segdedup: text= required"))
        val out = graft.operators.Curation.segmentDedup(df, key, text,
          segTokens = m.args.get("tokens").map(_.toInt).getOrElse(20))
        ctx.writeStream(m, out, RowType)
      }),

    Registered("dupspans", RowType, RowType,
      "in=STREAM:key=COL:text=COL[:grans=100,50,20]:out=STREAM", (ctx, m) => {
        // Variable-span EXACTSUBSTR (Curation.segmentDedupSpans):
        // multi-granularity dup windows merged into maximal spans;
        // emits (id, n_tokens, dup_tokens, n_spans).
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("dupspans: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("dupspans: text= required"))
        val grans = m.args.get("grans")
          .map(_.split(",").map(_.trim.toInt).toSeq)
          .getOrElse(Seq(100, 50, 20))
        ctx.writeStream(m,
          graft.operators.Curation.segmentDedupSpans(df, key, text, grans),
          RowType)
      }),

    Registered("anchoredspans", RowType, RowType,
      "in=STREAM:key=COL:text=COL[:anchor=16:mintok=5:maxrun=512]:out=STREAM",
      (ctx, m) => {
        // Unaligned EXACTSUBSTR (q237 / Curation.anchoredDedupSpans):
        // content-defined anchor segmentation catches copies at ANY
        // token offset (dupspans' fixed windows are aligned-only);
        // emits (id, n_tokens, dup_tokens, n_spans).
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("anchoredspans: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("anchoredspans: text= required"))
        val anchor = m.args.getOrElse("anchor", "16").toInt
        val mintok = m.args.getOrElse("mintok", "5").toInt
        val maxrun = m.args.getOrElse("maxrun", "512").toInt
        ctx.writeStream(m, graft.operators.Curation.anchoredDedupSpans(
          df, key, text, anchor, mintok, maxrun), RowType)
      }),

    Registered("spanowners", RowType, RowType,
      "in=STREAM:key=COL:text=COL[:grans=100,50,20]:out=STREAM", (ctx, m) => {
        // Cross-doc EXACTSUBSTR provenance (q230 /
        // Curation.segmentDedupSpanOwners): each merged dup span
        // attributed to its first-occurrence doc; emits
        // (id, start, end, owner).
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("spanowners: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("spanowners: text= required"))
        val grans = m.args.get("grans")
          .map(_.split(",").map(_.trim.toInt).toSeq)
          .getOrElse(Seq(100, 50, 20))
        ctx.writeStream(m,
          graft.operators.Curation.segmentDedupSpanOwners(
            df, key, text, grans),
          RowType)
      }),

    Registered("urlnorm", RowType, RowType,
      "in=STREAM:url=COL[:col=url_norm]:out=STREAM", (ctx, m) => {
        // RFC 3986-subset URL canonicalization
        // (Curation.urlNormalize): appends the normalized column so
        // downstream dedup keys on one URL per resource.
        val df = ctx.readStream(m, RowType)
        val u = m.args.getOrElse("url",
          throw new BuildError("urlnorm: url= required"))
        ctx.writeStream(m, df.withColumn(
          m.args.getOrElse("col", "url_norm"),
          graft.operators.Curation.urlNormalize(
            org.apache.spark.sql.functions.col(u))), RowType)
      }),

    Registered("domaincap", RowType, RowType,
      "in=STREAM:domain=COL:order=COL[,COL...]:cap=N[:salt=COL][:parts=16][:col=rk]:out=STREAM",
      (ctx, m) => {
        // Per-domain quota (Ops.saltedTopKPerGroup): keep the top cap
        // rows per domain in the given order, skew-safe for hub
        // domains. order entries take an optional :desc suffix; the
        // default salt is the first order column.
        val df = ctx.readStream(m, RowType)
        val domain = m.args.getOrElse("domain",
          throw new BuildError("domaincap: domain= required"))
        val order = m.args.getOrElse("order",
            throw new BuildError("domaincap: order= required"))
          .split(",").toSeq.map { c =>
            c.trim.split("\\.") match {
              case Array(n, "desc") => col(n).desc
              case Array(n, "asc") => col(n).asc
              case Array(n) => col(n).asc
              case _ => throw new BuildError(
                s"domaincap: bad order entry '$c' (want col[.asc|.desc])")
            }
          }
        val cap = m.args.getOrElse("cap",
          throw new BuildError("domaincap: cap= required")).toInt
        val saltName = m.args.getOrElse("salt",
          m.args("order").split(",").head.trim.split("\\.").head)
        val out = graft.operators.Ops.saltedTopKPerGroup(df, Seq(domain),
          order, cap, saltCol = col(saltName),
          saltParts = m.args.get("parts").map(_.toInt).getOrElse(16),
          rankCol = m.args.getOrElse("col", "rk"))
        ctx.writeStream(m, out, RowType)
      }),

    Registered("sql", RowType, RowType,
      "in=STREAM:views=s1,s2:out=STREAM:query=SELECT ... FROM __in  (query= MUST be last)",
      (ctx, m) => {
        // Arbitrary SQL mid-pipeline: the in-stream is view __in; other
        // named row streams join in via views= (each counts as a
        // reader, so stream validation stays honest). query= must be
        // the LAST argument — everything after it is taken verbatim,
        // so SQL containing ':' (timestamp literals) or '=' parses
        // fine. The reference delegates SQL to external DBs
        // (dbitool.pl:1387-1459); here the engine IS the SQL engine.
        val qIdx = m.raw.indexOf(":query=")
        if (qIdx < 0)
          throw new BuildError("sql: query= required (must be the last argument)")
        val q = m.raw.substring(qIdx + ":query=".length)
        val clean = parseWord(m.raw.take(qIdx)) // in/out/views, sans query text
        val df = ctx.readStream(clean, RowType)
        // Views live in an ISOLATED child session (own temp-view
        // catalog, shared SparkContext + cache): registering __in or a
        // stream name can't clobber a user's same-named view on the
        // shared session, and nothing leaks after the pipeline — two
        // pipelines on one session compose safely.
        val sqlSession = ctx.spark.newSession()
        graft.functions.GraftExtensions.register(sqlSession)
        ColumnBridge.rebind(sqlSession, df).createOrReplaceTempView("__in")
        clean.args.get("views").foreach(_.split(",").filter(_.nonEmpty).foreach { vn =>
          val (vdf, vt) = ctx.streams.getOrElse(vn,
            throw new BuildError(s"sql: unknown stream '$vn'"))
          if (vt != RowType)
            throw new BuildError(s"sql: '$vn' is not a row stream")
          ctx.readers(vn) += 1
          ColumnBridge.rebind(sqlSession, vdf).createOrReplaceTempView(vn)
        })
        // Rebind the result BACK to the pipeline session so downstream
        // modules keep operating on ctx.spark.
        ctx.writeStream(clean, ColumnBridge.rebind(ctx.spark, sqlSession.sql(q)), RowType)
      }),

    // ----- Structured Streaming surface (north-star; the reference has
    // no streaming — SURVEY §2.5). A streaming DataFrame rides the same
    // named-stream registry: sources mark streams unbounded
    // (df.isStreaming), transforms stay lazy, and the streamwrite sink
    // runs the query. Batch row streams flow through the same modules
    // (batch twin), so a chain is oracle-checkable offline and
    // unbounded online.

    Registered("eventread", NoneType, RowType,
      "dir=SFDIR|rate=N:out=STREAM", (ctx, m) => {
        // dir= file-streams the events table (new files appear → new
        // micro-batches); rate= is the built-in rate source mapped to
        // the events schema for self-contained demos/tests.
        val df = (m.args.get("dir"), m.args.get("rate")) match {
          case (Some(dir), None) =>
            graft.streaming.EventStreams.readEventStream(ctx.spark, dir)
          case (None, Some(n)) =>
            ctx.spark.readStream.format("rate")
              .option("rowsPerSecond", n.toInt).load()
              .select(col("value").as("event_id"),
                col("timestamp").as("ts"),
                (col("value") % 100).as("user_id"),
                expr("CASE CAST(value % 4 AS INT) WHEN 0 THEN 'view' WHEN 1 THEN 'click' " +
                  "WHEN 2 THEN 'purchase' ELSE 'refund' END").as("event_type"),
                (col("value") % 10).cast("double").as("value"),
                to_json(struct((col("value") % 5).cast("int").as("k"))).as("props"))
          case _ => throw new BuildError("eventread: exactly one of dir= or rate= required")
        }
        ctx.writeStream(m, df, RowType)
      }),

    Registered("eventwindow", RowType, RowType,
      "in=STREAM:watermark=2 hours:width=1 hour:out=STREAM", (ctx, m) => {
        // Watermarked tumbling event-time aggregate; on a bounded row
        // stream it is the exact batch twin (q61's oracle-checked
        // shape), so the same chain verifies offline.
        val df = ctx.readStream(m, RowType)
        val width = m.args.getOrElse("width", "1 hour")
        val out =
          if (df.isStreaming)
            graft.streaming.EventStreams.streamingTumbling(df,
              m.args.getOrElse("watermark", "2 hours"), width)
          else graft.streaming.EventStreams.tumblingCounts(df, width)
        ctx.writeStream(m, out, RowType)
      }),

    Registered("watermark", RowType, RowType,
      "in=STREAM:col=ts:delay=2 hours:out=STREAM", (ctx, m) => {
        // Event-time watermark as a composable primitive: the stateful
        // modules (intervaljoin under streaming, custom sql windows)
        // need BOTH inputs watermarked, which per-module watermark=
        // args can't express. No-op on bounded input, so the same
        // chain verifies offline.
        val df = ctx.readStream(m, RowType)
        val out =
          if (df.isStreaming)
            df.withWatermark(m.args.getOrElse("col", "ts"),
              m.args.getOrElse("delay", "2 hours"))
          else df
        ctx.writeStream(m, out, RowType)
      }),

    Registered("streamdedup", RowType, RowType,
      "in=STREAM:key=event_id:ts=ts:watermark=2 hours:out=STREAM", (ctx, m) => {
        // Exact keyed dedup with watermark-evicted state (unbounded
        // twin of dedup exact); batch input takes the plain distinct.
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key", "event_id")
        val out =
          if (df.isStreaming)
            df.withWatermark(m.args.getOrElse("ts", "ts"),
                m.args.getOrElse("watermark", "2 hours"))
              .dropDuplicatesWithinWatermark(key)
          else df.dropDuplicates(key)
        ctx.writeStream(m, out, RowType)
      }),

    Registered("streamwrite", RowType, NoneType,
      "in=STREAM:path=DIR:checkpoint=DIR (rows reported = batches landed by THIS run; deleting the checkpoint but not the output dir re-lands data)", (ctx, m) => {
        // Terminal sink: for unbounded input, start the query on the
        // idempotent per-batch parquet sink (exactly-once landing dirs,
        // batch_<id>/_SUCCESS markers), drain everything available,
        // stop, and report rows landed. Bounded input writes one
        // batch_0 dir with the same layout. Spark triggers no-data
        // micro-batches as the watermark advances, so windows closed by
        // the final wave emit before stop().
        val df = ctx.readStream(m, RowType)
        val path = m.args.getOrElse("path",
          throw new BuildError("streamwrite: path= required"))
        val ckpt = m.args.getOrElse("checkpoint", s"$path/_checkpoint")
        ctx.addSink(m.raw, () => {
          // Rows reported = batches landed by THIS invocation only: a
          // pre-run listing delta excludes batch_* dirs left by earlier
          // runs (a checkpoint-resumed rerun that lands nothing new
          // reports 0, not the historical total).
          def listBatches(): Set[String] =
            Option(new java.io.File(path).listFiles())
              .getOrElse(Array.empty)
              .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
              .map(_.getAbsolutePath).toSet
          val pre = listBatches()
          if (df.isStreaming) {
            val q = graft.streaming.EventStreams.idempotentParquetSink(df, path, ckpt)
            try q.processAllAvailable() finally q.stop()
          } else
            graft.streaming.EventStreams.writeBatchIdempotent(df, 0L, path)
          val batchDirs = (listBatches() -- pre).toIndexedSeq.sorted
          if (batchDirs.isEmpty) 0L
          else ctx.spark.read.parquet(batchDirs: _*).count()
        })
      }),

    Registered("chunk", RowType, RowType,
      "in=STREAM:key=COL:text=COL:size=32:stride=24:keeptext:out=STREAM", (ctx, m) => {
        // Context-window chunking (Curation.chunkDocs): overlapping
        // token windows per document, zero-shuffle generator.
        // keeptext emits chunk_text too (chunk → dedupnear chains);
        // default is fingerprints only.
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("chunk: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("chunk: text= required"))
        ctx.writeStream(m, graft.operators.Curation.chunkDocs(df, key, text,
          m.args.getOrElse("size", "32").toInt,
          m.args.getOrElse("stride", "24").toInt,
          withText = m.args.contains("keeptext")), RowType)
      }),

    Registered("spreadsheetread", NoneType, RowType,
      "fname=FILE:type=csv:sheet=NAME:x=1:y=1:header=1:out=STREAM", (ctx, m) => {
        // Reference spreadsheetread (dbitool.pl:2696-2784) reads an
        // x/y-origin cell block with optional header row and sheet
        // selection. type=csv, type=xlsx (pure-JDK OOXML reader,
        // formats/Xlsx.scala) and type=ods/sxc (formats/Ods.scala);
        // only the legacy binary xls needs POI, absent from this
        // image. In-memory like the reference.
        val f = m.args.getOrElse("fname",
          throw new BuildError("spreadsheetread: fname= required"))
        val sheet = m.args.getOrElse("sheet", "")
        val grid: Seq[Seq[String]] = m.args.getOrElse("type", "csv") match {
          case "csv" =>
            scala.io.Source.fromFile(f).getLines()
              .map(_.split(",", -1).toSeq).toSeq
          case "xlsx" => graft.formats.Xlsx.read(f, sheet)
          case "ods" | "sxc" => graft.formats.Ods.read(f, sheet)
          case "xls" => graft.formats.Xls.read(f, sheet)
          case t => throw new BuildError(
            s"spreadsheetread: type=$t unsupported (csv, xls, xlsx, ods)")
        }
        val x = m.args.getOrElse("x", "1").toInt
        val y = m.args.getOrElse("y", "1").toInt
        val hasHeader = m.args.getOrElse("header", "1") == "1"
        val lines = grid.drop(y - 1).map(_.drop(x - 1))
        if (lines.isEmpty) throw new BuildError(s"spreadsheetread: empty block in $f")
        val names =
          if (hasHeader) lines.head.map(c => Option(c).getOrElse("").trim)
          else lines.head.indices.map(i => s"col${i + 1}")
        val body = if (hasHeader) lines.tail else lines
        import ctx.spark.implicits._
        val df = body.map(r => names.indices.map(i =>
            if (i < r.length) r(i) else null).toList)
          .toDF("cells")
          .select(names.zipWithIndex.map { case (n, i) =>
            col("cells").getItem(i).as(n) }: _*)
        ctx.writeStream(m, df, RowType)
      }),

    Registered("spreadsheetwrite", RowType, NoneType,
      "in=STREAM:fname=FILE:type=csv:x=1:y=1:header=1", (ctx, m) => {
        val typ = m.args.getOrElse("type", "csv")
        if (!Set("csv", "xls", "xlsx", "ods").contains(typ))
          throw new BuildError(
            s"spreadsheetwrite: type=$typ unsupported (csv, xls, xlsx, ods)")
        val df = ctx.readStream(m, RowType)
        val f = m.args.getOrElse("fname",
          throw new BuildError("spreadsheetwrite: fname= required"))
        val x = m.args.getOrElse("x", "1").toInt
        val y = m.args.getOrElse("y", "1").toInt
        val hasHeader = m.args.getOrElse("header", "1") == "1"
        ctx.addSink(m.raw, () => {
          val data = df.collect()
          if (typ != "csv") {
            // x/y origin as sparse leading nulls; numerics stay typed.
            val lead = Seq.fill[Any](x - 1)(null)
            val hdr: Seq[Seq[Any]] =
              if (hasHeader) Seq(lead ++ df.columns.toSeq) else Nil
            val blank = Seq.fill(y - 1)(Seq.empty[Any])
            val grid = blank ++ hdr ++ data.map(r => lead ++ r.toSeq)
            typ match {
              case "xlsx" => graft.formats.Xlsx.write(f, grid)
              case "ods" => graft.formats.Ods.write(f, grid)
              case _ => graft.formats.Xls.write(f, grid)
            }
          } else {
            val pad = "," * (x - 1)
            val rows = data.map(r => pad + r.toSeq.map {
              case null => ""; case v => v.toString
            }.mkString(","))
            val hdr = if (hasHeader) Seq(pad + df.columns.mkString(",")) else Nil
            val blank = Seq.fill(y - 1)("")
            val p = java.nio.file.Paths.get(f)
            Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
            java.nio.file.Files.writeString(p,
              (blank ++ hdr ++ rows).mkString("\n"))
          }
          data.length.toLong
        })
      }),

    // WARC/1.x container ingest (VERDICT r16 #1) — the Common Crawl
    // arrival format, the stage between files-on-disk and htmlextract:
    // warcread:in=crawl/*.warc.gz | htmlextract:html=text | ... is the
    // full q250 recipe on real crawl data. One task per file, one
    // streaming pass per task, multi-member gzip sniffed per file
    // (formats/Warc.scala). type= filters WARC-Type (default response —
    // the page payloads; type=all keeps warcinfo/request/metadata too);
    // :binary keeps the raw payload bytes instead of the UTF-8 text;
    // :locators adds each record's gzip-member compressed extent
    // (member_offset, member_length — the range-request replay
    // locator a downstream cdxindex publishes as (offset, length)).
    Registered("warcread", NoneType, RowType,
      "in=FILE_OR_GLOB:out=STREAM[:type=response|all][:binary][:locators]",
      (ctx, m) => {
        val path = m.args.getOrElse("in",
          throw new BuildError("warcread: in= required"))
        val typ = m.args.getOrElse("type", "response")
        val all =
          if (m.args.contains("locators"))
            graft.formats.Warc.readMembers(ctx.spark, path)
          else graft.formats.Warc.read(ctx.spark, path)
        val filtered =
          if (typ == "all") all else all.filter(col("warc_type") === typ)
        val out =
          if (m.args.contains("binary")) filtered
          else filtered.withColumn("text", col("payload").cast("string"))
            .drop("payload")
        ctx.writeStream(m.copy(args = m.args - "in"), out, RowType)
      }),

    // CDX-style capture index over a warcread stream (q269): one row
    // per response capture, SURT urlkey + ts14 + digest + in-file
    // ordinal — the lookup artifact a crawl archive publishes next to
    // its containers (Warc.cdxIndex; works on both the text and
    // :binary warcread shapes).
    // Index-server matchType lookups (q295, Warc.cdxScope): scoped
    // retrieval from a published CDX stream — sargable SURT-prefix
    // predicates, so a range-clustered artifact answers by pruning.
    Registered("cdxlookup", RowType, RowType,
      "in=STREAM:scope=exact|prefix|host|domain:key=K:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        if (!df.columns.contains("urlkey"))
          throw new BuildError("cdxlookup: input lacks column 'urlkey' " +
            "(expects a cdx index stream)")
        val scope = m.args.getOrElse("scope",
          throw new BuildError("cdxlookup: scope= required"))
        if (!Set("exact", "prefix", "host", "domain").contains(scope))
          throw new BuildError(
            s"cdxlookup: scope must be exact|prefix|host|domain, got '$scope'")
        val key = m.args.getOrElse("key",
          throw new BuildError("cdxlookup: key= required"))
        ctx.writeStream(m, graft.formats.Warc.cdxScope(df, scope, key),
          RowType)
      }),

    Registered("cdxindex", RowType, RowType,
      "in=STREAM:out=STREAM[:sha1]",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        for (c <- Seq("warc_type", "url", "ts", "path", "rec_no"))
          if (!df.columns.contains(c))
            throw new BuildError(s"cdxindex: input lacks column '$c' " +
              "(expects a warcread stream)")
        // :sha1 adds digest_sha1b32 — the CDXJ wire digest standard
        // archive tools compare (kernel-pinned; md5 stays the
        // oracle-replayed default)
        ctx.writeStream(m, graft.formats.Warc.cdxIndex(df,
          m.args.contains("sha1")), RowType)
      }),

    // Request/response capture pairing over a warcread stream (q270):
    // one row per response with its request's verb/User-Agent and the
    // declared Content-Length from the surfaced HTTP head.
    Registered("captures", RowType, RowType,
      "in=STREAM:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        for (c <- Seq("warc_type", "url", "ts"))
          if (!df.columns.contains(c))
            throw new BuildError(s"captures: input lacks column '$c' " +
              "(expects a warcread stream)")
        ctx.writeStream(m, graft.formats.Warc.captures(df), RowType)
      }),

    // CDXJ text publication of a cdxindex stream (q279): sorted
    // `urlkey<SP>ts14<SP>{json}` lines, one text file per range slice
    // — the interchange format archives ship next to containers.
    Registered("cdxjwrite", RowType, NoneType,
      "in=STREAM:out=PATH",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        for (c <- Seq("urlkey", "ts14"))
          if (!df.columns.contains(c))
            throw new BuildError(s"cdxjwrite: input lacks column '$c' " +
              "(expects a cdxindex stream)")
        val path = m.args.getOrElse("out",
          throw new BuildError("cdxjwrite: out= required"))
        ctx.addSink(m.raw, () => {
          graft.formats.Warc.cdxjLines(df).write.mode("overwrite").text(path)
          ctx.log("cdxjwrite", s"wrote $path")
          0L
        })
      }),

    // Distributed container EXPORT (the write half of warcread): one
    // gzip'd .warc.gz per partition — member per record, segment per
    // task, driver never sees the data (Warc.writeShards). type=
    // response frames HTTP envelopes from status=COL; the default
    // conversion/resource path writes raw payloads with mime= as the
    // record Content-Type — `type=conversion` IS the WET derivative
    // export (q288).
    Registered("warcwrite", RowType, NoneType,
      "in=STREAM:out=DIR:url=COL:ts=COL:body=COL" +
        "[:type=conversion][:status=COL][:mime=text/plain][:files=N]",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"warcwrite: $k= required"))
        val out = req("out")
        val (u, ts, b) = (req("url"), req("ts"), req("body"))
        for (c <- Seq(u, ts, b) ++ m.args.get("status"))
          if (!df.columns.contains(c))
            throw new BuildError(s"warcwrite: no column '$c'")
        val typ = m.args.getOrElse("type", "conversion")
        val files = m.args.getOrElse("files", "0") match {
          case "0" => ctx.spark.sparkContext.defaultParallelism
          case n => n.toInt
        }
        ctx.addSink(m.raw, () => {
          val n = graft.formats.Warc.writeShards(df, out, files, typ,
            u, ts, b, m.args.get("status"),
            m.args.getOrElse("mime", "text/plain"))
          ctx.log("warcwrite", s"wrote $n shards to $out")
          n.toLong
        })
      }),

    Registered("cdxjread", NoneType, RowType, "in=PATH:out=STREAM",
      (ctx, m) => {
        val path = m.args.getOrElse("in",
          throw new BuildError("cdxjread: in= required"))
        ctx.writeStream(m.copy(args = m.args - "in"),
          graft.formats.Warc.cdxjParse(ctx.spark.read.text(path)), RowType)
      }),

    // Revisit detection against a standing index (q281): classify
    // fresh captures new/unchanged/changed — the producer side of
    // the revisit records q267's ingest consumes.
    Registered("revisitdetect", RowType, RowType,
      "in=STREAM:standing=STREAM:out=STREAM",
      (ctx, m) => {
        val fresh = ctx.readStream(m, RowType)
        val sname = m.args.getOrElse("standing",
          throw new BuildError("revisitdetect: standing= required"))
        val (sd, st) = ctx.streams.getOrElse(sname,
          throw new BuildError(s"revisitdetect: unknown stream '$sname'"))
        if (st != RowType)
          throw new BuildError(s"revisitdetect: '$sname' is not a row stream")
        ctx.readers(sname) += 1
        for (c <- Seq("urlkey", "ts14", "digest"); d <- Seq(fresh, sd))
          if (!d.columns.contains(c))
            throw new BuildError(s"revisitdetect: input lacks column '$c' " +
              "(expects cdxindex streams)")
        ctx.writeStream(m,
          graft.operators.Curation.revisitDetect(fresh, sd), RowType)
      }),

    Registered("bsonread", NoneType, RowType, "in=FILE:out=STREAM", (ctx, m) => {
      val path = m.args.getOrElse("in", throw new BuildError("bsonread: in= required"))
      ctx.writeStream(m.copy(args = m.args - "in"),
        graft.formats.Bson.read(ctx.spark, path), RowType)
    }),

    Registered("bsonwrite", RowType, NoneType, "in=STREAM:out=FILE", (ctx, m) => {
      val df = ctx.readStream(m, RowType)
      val path = m.args.getOrElse("out", throw new BuildError("bsonwrite: out= required"))
      ctx.addSink(m.raw, () => {
        graft.formats.Bson.write(df, path)
        ctx.log("bsonwrite", s"wrote $path")
        0L
      })
    }),

    Registered("parquetread", NoneType, RowType, "in=PATH:out=STREAM", (ctx, m) => {
      val path = m.args.getOrElse("in", throw new BuildError("parquetread: in= required"))
      ctx.writeStream(m.copy(args = m.args - "in"),
        ctx.spark.read.parquet(path), RowType)
    }),

    Registered("parquetwrite", RowType, NoneType,
      "in=STREAM:out=PATH[:files=N][:targetbytes=B][:partitionby=c1,c2]", (ctx, m) => {
      val df = ctx.readStream(m, RowType)
      val path = m.args.getOrElse("out", throw new BuildError("parquetwrite: out= required"))
      // files=N is the compaction path (the small-files answer at
      // 100 TB: parquetread:in=shattered | parquetwrite:files=N): one
      // round-robin repartition to exactly N output files. Without it
      // the input partitioning passes through untouched.
      val explicitFiles = m.args.get("files").map(_.toInt)
      explicitFiles.foreach(n => if (n < 1)
        throw new BuildError(s"parquetwrite: files= must be >= 1, got $n"))
      // targetbytes=B auto-sizes the fan-out from Catalyst's plan-stat
      // byte estimate (see Sinks.compactParquet) — compaction without
      // hand-picking N.
      val targetBytes = m.args.get("targetbytes").map(_.toLong)
      targetBytes.foreach(t => if (t < 1)
        throw new BuildError(s"parquetwrite: targetbytes= must be >= 1, got $t"))
      if (explicitFiles.nonEmpty && targetBytes.nonEmpty)
        throw new BuildError("parquetwrite: files= and targetbytes= are exclusive")
      val files = explicitFiles.orElse(targetBytes.map { t =>
        (df.queryExecution.optimizedPlan.stats.sizeInBytes / t)
          .min(BigInt(100000)).max(BigInt(0)).toInt + 1
      })
      // partitionby=c1,c2 writes the hive-style dir layout (c1=v/...)
      // Spark's readers partition-prune on — the standard 100 TB
      // date/tenant layout. Combined with files=N the repartition goes
      // on the partition columns so each dir gets coherent files, not
      // one shard of every task.
      val partCols = m.args.get("partitionby")
        .map(_.split(",").toSeq.map(_.trim)).getOrElse(Nil)
      ctx.addSink(m.raw, () => {
        val obs = org.apache.spark.sql.Observation()
        val shaped =
          if (partCols.nonEmpty && files.nonEmpty)
            df.repartition(files.get, partCols.map(col): _*)
          else files.fold(df)(df.repartition)
        val out = shaped.observe(obs, count(lit(1)).as("rows"))
        val w = out.write.mode("overwrite")
        (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
          .parquet(path)
        val rows = obs.get("rows").asInstanceOf[Long]
        ctx.log("parquetwrite", s"wrote $rows rows to $path")
        rows
      })
    }),

    // ORC: the other splittable columnar format Spark ships natively —
    // same role as parquetread/parquetwrite (extension; the reference
    // has no columnar formats at all).
    Registered("orcread", NoneType, RowType, "in=PATH:out=STREAM", (ctx, m) => {
      val path = m.args.getOrElse("in", throw new BuildError("orcread: in= required"))
      ctx.writeStream(m.copy(args = m.args - "in"),
        ctx.spark.read.orc(path), RowType)
    }),

    Registered("orcwrite", RowType, NoneType, "in=STREAM:out=PATH", (ctx, m) => {
      val df = ctx.readStream(m, RowType)
      val path = m.args.getOrElse("out", throw new BuildError("orcwrite: out= required"))
      ctx.addSink(m.raw, () => {
        df.write.mode("overwrite").orc(path)
        ctx.log("orcwrite", s"wrote $path")
        0L
      })
    }),

    Registered("zorderwrite", RowType, NoneType,
      "in=STREAM:x=COL:y=COL:files=N:out=PATH", (ctx, m) => {
        // Z-order-clustered parquet write (Ops.zorderWrite): each
        // output file covers a sub-rectangle of the (x, y) key space,
        // so 2-D predicates prune at the footer min/max level.
        val df = ctx.readStream(m, RowType)
        val x = m.args.getOrElse("x", throw new BuildError("zorderwrite: x= required"))
        val y = m.args.getOrElse("y", throw new BuildError("zorderwrite: y= required"))
        val path = m.args.getOrElse("out",
          throw new BuildError("zorderwrite: out= required"))
        val files = m.args.getOrElse("files", "32").toInt
        ctx.addSink(m.raw, () => {
          graft.operators.Ops.zorderWrite(df, x, y, path, files)
          ctx.log("zorderwrite", s"wrote $path")
          0L
        })
      }),

    Registered("sortwrite", RowType, NoneType,
      "in=STREAM:by=COL[,COL...]:files=N:out=PATH", (ctx, m) => {
        // Range-clustered sorted parquet write — the 1-D sibling of
        // zorderwrite and the terasort shape: repartitionByRange gives
        // each file a DISJOINT slice of the key range (sampled range
        // boundaries, skew-resistant), sortWithinPartitions orders
        // inside, so footer min/max prunes any range predicate on the
        // leading column to the few files that overlap it.
        val df = ctx.readStream(m, RowType)
        val by = m.args.getOrElse("by",
            throw new BuildError("sortwrite: by= required"))
          .split(",").toSeq.map(c => col(c.trim))
        val path = m.args.getOrElse("out",
          throw new BuildError("sortwrite: out= required"))
        val files = m.args.getOrElse("files", "32").toInt
        if (files < 1)
          throw new BuildError(s"sortwrite: files= must be >= 1, got $files")
        ctx.addSink(m.raw, () => {
          val obs = org.apache.spark.sql.Observation()
          df.repartitionByRange(files, by: _*)
            .sortWithinPartitions(by: _*)
            .observe(obs, count(lit(1)).as("rows"))
            .write.mode("overwrite").parquet(path)
          val rows = obs.get("rows").asInstanceOf[Long]
          ctx.log("sortwrite", s"wrote $rows rows to $path")
          rows
        })
      }),

    Registered("avroread", NoneType, RowType, "in=PATH:out=STREAM", (ctx, m) => {
      // Avro object containers via the classpath's core Avro runtime
      // (no spark-avro module needed) — formats.Avro, one task/file.
      val path = m.args.getOrElse("in", throw new BuildError("avroread: in= required"))
      ctx.writeStream(m.copy(args = m.args - "in"),
        graft.formats.Avro.read(ctx.spark, path), RowType)
    }),

    Registered("avrowrite", RowType, NoneType, "in=STREAM:out=PATH", (ctx, m) => {
      val df = ctx.readStream(m, RowType)
      val path = m.args.getOrElse("out", throw new BuildError("avrowrite: out= required"))
      ctx.addSink(m.raw, () => {
        val n = graft.formats.Avro.write(df, path)
        ctx.log("avrowrite", s"wrote $path")
        n
      })
    }),

    // ---- multimodal modules (extension; no reference counterpart) ----
    // Media files as rows of (path, modificationTime, length, content):
    // the binary column stays opaque until a media* transform touches it.
    Registered("binaryread", NoneType, RowType, "in=DIR:glob=PATTERN:out=STREAM",
      (ctx, m) => {
        val dir = m.args.getOrElse("in",
          throw new BuildError("binaryread: in= required"))
        ctx.writeStream(m.copy(args = m.args - "in" - "glob"),
          graft.multimodal.Multimodal.readBinary(ctx.spark, dir,
            m.args.getOrElse("glob", "*")), RowType)
      }),

    // Decode media metadata (real javax.imageio for PNG/JPEG/GIF/BMP;
    // GMM1 stub for formats with no in-container codec).
    Registered("mediameta", RowType, RowType, "in=STREAM:col=content:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        ctx.writeStream(m, graft.multimodal.Multimodal.decodeMeta(
          df, m.args.getOrElse("col", "content")), RowType)
      }),

    // Deterministic feature vector from media bytes — feeds the
    // similarity operators (cosine top-k / ANN / near-dup).
    Registered("mediafeatures", RowType, RowType,
      "in=STREAM:col=content:dim=64:out=STREAM", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val dim = m.args.getOrElse("dim", "64").toInt
        if (dim <= 0) throw new BuildError(s"mediafeatures: dim must be > 0, got $dim")
        ctx.writeStream(m, graft.multimodal.Multimodal.extractFeatures(
          df, m.args.getOrElse("col", "content"), dim), RowType)
      }),

    // Perceptual hash (60-bit integer average-hash) from media bytes —
    // feeds the banded-hamming near-dup path
    // (Dedup.fingerprintDuplicatePairs), like q149.
    Registered("mediaphash", RowType, RowType,
      "in=STREAM:col=content:out=STREAM", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        ctx.writeStream(m, graft.multimodal.Multimodal.perceptualHash(
          df, m.args.getOrElse("col", "content")), RowType)
      }),

    // Deterministic shuffle-shard assignment from the DSL: adds
    // shard + pos (md5(key‖seed) draw — Ops.shuffleShardAssign), the
    // reproducible training-export shuffle. Use sink modules (or
    // Ops.shuffledShardedWrite) to materialize the shard files.
    Registered("shuffleshard", RowType, RowType,
      "in=STREAM:key=COL:shards=N:seed=S:out=STREAM", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("shuffleshard: key= required"))
        val n = m.args.getOrElse("shards", "8").toInt
        if (n < 1) throw new BuildError(s"shuffleshard: shards must be >= 1, got $n")
        ctx.writeStream(m, graft.operators.Ops.shuffleShardAssign(
          df, key, n, m.args.getOrElse("seed", "")), RowType)
      }),

    // Relational PageRank from the DSL: in= is an edge stream with
    // src=/dst= columns; emits (id, r) over all nodes, with textbook
    // dangling-mass redistribution (Ops.pageRank scaladoc).
    Registered("pagerank", RowType, RowType,
      "in=STREAM:src=COL:dst=COL:iters=3:damping=0.85:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val iters = m.args.getOrElse("iters", "3").toInt
        if (iters < 0) throw new BuildError(s"pagerank: iters must be >= 0, got $iters")
        val edges = df.select(
          col(m.args.getOrElse("src", "src")).as("src"),
          col(m.args.getOrElse("dst", "dst")).as("dst"))
        ctx.writeStream(m, graft.operators.Ops.pageRank(edges, iters,
          m.args.getOrElse("damping", "0.85").toDouble), RowType)
      }),

    // Largest-remainder budget apportionment (q294,
    // Ops.apportionBudget): total=N split across key rows
    // proportional to weight=COL, exact integers, sum == N.
    Registered("apportion", RowType, RowType,
      "in=STREAM:key=COL:weight=COL:total=N:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"apportion: $k= required"))
        val (k, w) = (req("key"), req("weight"))
        for (c <- Seq(k, w)) if (!df.columns.contains(c))
          throw new BuildError(s"apportion: no column '$c'")
        val total = req("total").toLong
        if (total < 0)
          throw new BuildError(s"apportion: total must be >= 0, got $total")
        ctx.writeStream(m,
          graft.operators.Ops.apportionBudget(df, k, w, total), RowType)
      }),

    // Harmonic centrality (q292/q293, Ops.harmonicCentrality /
    // hyperBallCentrality): the host-ranking metric web corpora
    // publish alongside PageRank. mode=exact runs all-pairs bounded
    // BFS (host-graph cardinalities); mode=hyperball runs the O(V)-
    // sketch-state HyperBall path for web scale.
    Registered("harmonic", RowType, RowType,
      "in=STREAM:src=COL:dst=COL:hops=N[:mode=exact|hyperball|nf]" +
        "[:lgk=12]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val hops = m.args.getOrElse("hops", "6").toInt
        if (hops < 1)
          throw new BuildError(s"harmonic: hops must be >= 1, got $hops")
        val edges = df.select(
          col(m.args.getOrElse("src", "src")).as("src"),
          col(m.args.getOrElse("dst", "dst")).as("dst"))
        val out = m.args.getOrElse("mode", "exact") match {
          case "exact" => graft.operators.Ops.harmonicCentrality(edges, hops)
          case "hyperball" => graft.operators.Ops.hyperBallCentrality(
            edges, hops, m.args.getOrElse("lgk", "12").toInt)
          case "nf" => graft.operators.Ops.neighborhoodFunction(edges, hops)
          case x => throw new BuildError(
            s"harmonic: mode must be exact|hyperball|nf, got '$x'")
        }
        ctx.writeStream(m, out, RowType)
      }),

    // k-core backbone extraction (q225 / Ops.kCore): iterative peel
    // to the maximal subgraph of minimum degree >= k; emits
    // (node, deg) core members.
    Registered("kcore", RowType, RowType,
      "in=STREAM:u=COL:v=COL:k=N[:maxrounds=64]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val k = m.args.getOrElse("k",
          throw new BuildError("kcore: k= required")).toInt
        if (k < 1) throw new BuildError(s"kcore: k must be >= 1, got $k")
        val maxRounds = m.args.getOrElse("maxrounds", "64").toInt
        if (maxRounds < 1)
          throw new BuildError(
            s"kcore: maxrounds must be >= 1, got $maxRounds")
        val edges = df.select(
          col(m.args.getOrElse("u", "u")).as("u"),
          col(m.args.getOrElse("v", "v")).as("v"))
        ctx.writeStream(m, graft.operators.Ops.kCore(edges, k, maxRounds),
          RowType)
      }),

    // Community detection by monotone label propagation (q229 /
    // Ops.labelPropagation): deterministic plurality voting with the
    // min-clamp that guarantees a fixpoint; emits (node, label).
    Registered("labelprop", RowType, RowType,
      "in=STREAM:u=COL:v=COL[:maxrounds=64]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val maxRounds = m.args.getOrElse("maxrounds", "64").toInt
        if (maxRounds < 1)
          throw new BuildError(
            s"labelprop: maxrounds must be >= 1, got $maxRounds")
        val edges = df.select(
          col(m.args.getOrElse("u", "u")).as("u"),
          col(m.args.getOrElse("v", "v")).as("v"))
        ctx.writeStream(m,
          graft.operators.Ops.labelPropagation(edges, maxRounds), RowType)
      }),

    // HITS hubs & authorities (q226 / Ops.hits): emits
    // (id, hub, auth), max-normalized per round.
    Registered("hits", RowType, RowType,
      "in=STREAM:src=COL:dst=COL:iters=2:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val iters = m.args.getOrElse("iters", "2").toInt
        if (iters < 1 || iters > 32)
          throw new BuildError(s"hits: iters in [1,32], got $iters")
        val edges = df.select(
          col(m.args.getOrElse("src", "src")).as("src"),
          col(m.args.getOrElse("dst", "dst")).as("dst"))
        ctx.writeStream(m, graft.operators.Ops.hits(edges, iters), RowType)
      }),

    // EXACT Jaccard similarity self-join from the DSL (q170's
    // prefix-filter plan): every pair with word-set jaccard >=
    // threshold, zero false negatives, never quadratic.
    Registered("jaccardjoin", RowType, RowType,
      "in=STREAM:key=COL:text=COL:threshold=0.9:out=STREAM", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("jaccardjoin: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("jaccardjoin: text= required"))
        val thr = m.args.getOrElse("threshold", "0.9").toDouble
        if (thr <= 0.0 || thr > 1.0)
          throw new BuildError(s"jaccardjoin: threshold in (0,1], got $thr")
        ctx.writeStream(m, graft.operators.Dedup.prefixJaccardPairs(
          df, key, text, thr), RowType)
      }),

    // Per-node triangle counts from the DSL: in= is an edge stream;
    // edges are canonicalized (undirected, self-loops dropped,
    // deduplicated) before the degree-ordered count (q172).
    Registered("trianglecount", RowType, RowType,
      "in=STREAM:src=COL:dst=COL:out=STREAM", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val s = col(m.args.getOrElse("src", "src"))
        val d = col(m.args.getOrElse("dst", "dst"))
        val edges = df.select(least(s, d).as("u"), greatest(s, d).as("v"))
          .filter(col("u") < col("v")).distinct()
        ctx.writeStream(m, graft.operators.Ops.triangleCounts(edges), RowType)
      }),

    // Parent-pointer hierarchy flattening from the DSL: emits
    // (id, root, depth) via pointer doubling (q173) — 2^rounds max
    // depth in `rounds` join rounds.
    Registered("hierflatten", RowType, RowType,
      "in=STREAM:key=COL:parent=COL:rounds=4:out=STREAM", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("hierflatten: key= required"))
        val parent = m.args.getOrElse("parent",
          throw new BuildError("hierflatten: parent= required"))
        val rounds = m.args.getOrElse("rounds", "4").toInt
        if (rounds < 1 || rounds > 20)
          throw new BuildError(s"hierflatten: rounds in [1,20], got $rounds")
        ctx.writeStream(m, graft.operators.Ops.flattenHierarchy(
          df.select(col(key).as("id"), col(parent).as("parent")), rounds),
          RowType)
      }),

    // Exact largest-remainder stratified split from the DSL (q174):
    // appends `split`, integer-proportional per stratum, rows in
    // deterministic md5 order of key.
    Registered("stratsplit", RowType, RowType,
      "in=STREAM:key=COL:stratum=COL:weights=800,100,100:names=train,val,test:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("stratsplit: key= required"))
        val stratum = m.args.getOrElse("stratum",
          throw new BuildError("stratsplit: stratum= required"))
        val weights = m.args.getOrElse("weights", "800,100,100")
          .split(",").toSeq.map(_.trim.toLong)
        val names = m.args.getOrElse("names", "train,val,test")
          .split(",").toSeq.map(_.trim)
        if (weights.length != names.length)
          throw new BuildError("stratsplit: weights/names must align")
        ctx.writeStream(m, graft.operators.Ops.stratifiedSplit(
          df, key, stratum, weights, names), RowType)
      }),

    // Incremental aggregate maintenance from the DSL (q171): in= is a
    // snapshotDiff-shaped CDC stream, base= the previous aggregate
    // (group, cnt, sum); emits the advanced aggregate without
    // rescanning the base fact.
    Registered("incragg", RowType, RowType,
      "in=STREAM:base=STREAM:group=COL:measure=COL:cnt=COL:sum=COL:out=STREAM",
      (ctx, m) => {
        val cdc = ctx.readStream(m, RowType)
        val bname = m.args.getOrElse("base",
          throw new BuildError("incragg: base= required"))
        val (base, bt) = ctx.streams.getOrElse(bname,
          throw new BuildError(s"incragg: unknown stream '$bname'"))
        if (bt != RowType)
          throw new BuildError(s"incragg: '$bname' is not a row stream")
        ctx.readers(bname) += 1
        val group = m.args.getOrElse("group",
          throw new BuildError("incragg: group= required"))
        val measure = m.args.getOrElse("measure",
          throw new BuildError("incragg: measure= required"))
        val cntCol = m.args.getOrElse("cnt", "cnt")
        val sumCol = m.args.getOrElse("sum", "sum")
        ctx.writeStream(m, graft.operators.Ops.incrementalAggMerge(
          base, graft.operators.Ops.cdcAggContributions(cdc, group, measure),
          group, cntCol, sumCol), RowType)
      }),

    // Exact grouped OLS from the DSL (q178): per-group slope/
    // intercept/r² from decimal sufficient statistics — one hash-agg,
    // partition-order invariant. x=/y= must be integer-valued.
    Registered("linfit", RowType, RowType,
      "in=STREAM:group=COL[,COL]:x=COL:y=COL:out=STREAM", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val group = m.args.getOrElse("group",
          throw new BuildError("linfit: group= required"))
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val x = m.args.getOrElse("x",
          throw new BuildError("linfit: x= required"))
        val y = m.args.getOrElse("y",
          throw new BuildError("linfit: y= required"))
        ctx.writeStream(m, graft.operators.Ops.groupedLinearFit(
          df, group, col(x), col(y)), RowType)
      }),

    // Bounded-hop shortest paths from the DSL (q179): in= is a
    // weighted edge stream (src=/dst=/w=), seeds= the source stream
    // with an id column; emits (id, dist) for nodes reachable within
    // maxhops edges. Frontier Bellman-Ford — O(rounds·|E|) equi-joins.
    Registered("sssp", RowType, RowType,
      "in=STREAM:seeds=STREAM:id=COL:src=COL:dst=COL:w=COL:maxhops=6:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val sname = m.args.getOrElse("seeds",
          throw new BuildError("sssp: seeds= required"))
        val (seedDf, st) = ctx.streams.getOrElse(sname,
          throw new BuildError(s"sssp: unknown stream '$sname'"))
        if (st != RowType)
          throw new BuildError(s"sssp: '$sname' is not a row stream")
        ctx.readers(sname) += 1
        val maxHops = m.args.getOrElse("maxhops", "6").toInt
        if (maxHops < 1 || maxHops > 64)
          throw new BuildError(s"sssp: maxhops in [1,64], got $maxHops")
        val edges = df.select(
          col(m.args.getOrElse("src", "src")).as("src"),
          col(m.args.getOrElse("dst", "dst")).as("dst"),
          col(m.args.getOrElse("w", "w")).as("w"))
        val seeds = seedDf.select(col(m.args.getOrElse("id", "id")).as("id"))
        ctx.writeStream(m, graft.operators.Ops.shortestPaths(
          edges, seeds, maxHops), RowType)
      }),

    // Deterministic hash-guided random walks (q211 / Ops.randomWalks):
    // in= the edge stream, seeds= the start nodes; emits
    // (seed, step, node) walk corpora for graph-embedding training.
    Registered("randomwalk", RowType, RowType,
      "in=STREAM:seeds=STREAM:id=COL:src=COL:dst=COL:steps=4[:salt=w1]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val sname = m.args.getOrElse("seeds",
          throw new BuildError("randomwalk: seeds= required"))
        val (seedDf, st) = ctx.streams.getOrElse(sname,
          throw new BuildError(s"randomwalk: unknown stream '$sname'"))
        if (st != RowType)
          throw new BuildError(s"randomwalk: '$sname' is not a row stream")
        ctx.readers(sname) += 1
        val steps = m.args.getOrElse("steps", "4").toInt
        if (steps < 1 || steps > 64)
          throw new BuildError(s"randomwalk: steps in [1,64], got $steps")
        val edges = df.select(
          col(m.args.getOrElse("src", "src")).as("src"),
          col(m.args.getOrElse("dst", "dst")).as("dst"))
        val seeds = seedDf.select(col(m.args.getOrElse("id", "id")).as("id"))
        ctx.writeStream(m, graft.operators.Ops.randomWalks(
          edges, seeds, steps, m.args.getOrElse("salt", "w1")), RowType)
      }),

    // Exact weighted quantiles from the DSL (q184/q185): two-phase
    // coarse-bucket plan, no whole-group window task; permilles=
    // comma-separated points (500 = median). value=/weight= must be
    // integer-valued.
    Registered("wquantile", RowType, RowType,
      "in=STREAM:group=COL[,COL]:value=COL:weight=COL:permilles=500:shift=10:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val group = m.args.getOrElse("group",
          throw new BuildError("wquantile: group= required"))
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val value = m.args.getOrElse("value",
          throw new BuildError("wquantile: value= required"))
        val weight = m.args.getOrElse("weight",
          throw new BuildError("wquantile: weight= required"))
        val permilles = m.args.getOrElse("permilles", "500")
          .split(",").toSeq.map(_.trim.toInt)
        if (permilles.exists(p => p <= 0 || p > 1000))
          throw new BuildError(
            s"wquantile: permilles in (0,1000], got $permilles")
        val shift = m.args.getOrElse("shift", "10").toInt
        if (shift < 0 || shift > 40)
          throw new BuildError(s"wquantile: shift in [0,40], got $shift")
        ctx.writeStream(m, graft.operators.Ops.weightedQuantiles(
          df, group, col(value), col(weight), permilles, shift), RowType)
      }),

    // Feature-hashing linear inference from the DSL (q190): appends
    // (score, n_feats) per key from an inline integer weight list —
    // the weight table is an array literal in the plan, no join.
    Registered("hashscore", RowType, RowType,
      "in=STREAM:key=COL:text=COL:weights=INT[,INT]:bias=0:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("hashscore: key= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("hashscore: text= required"))
        val weights = m.args.getOrElse("weights",
          throw new BuildError("hashscore: weights= required"))
          .split(",").toSeq.map(_.trim.toInt)
        val bias = m.args.getOrElse("bias", "0").toLong
        ctx.writeStream(m, graft.operators.Ops.hashedFeatureScore(
          df, key, text, weights, bias), RowType)
      }),

    // Character-entropy quality signal (q210): appends the one-pass
    // codegen'd char-unigram entropy (nats) — the cheap
    // boilerplate/gibberish gate; narrow map-only plan at any scale.
    Registered("entropy", RowType, RowType,
      "in=STREAM:text=COL[:col=entropy][:round=4]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val text = m.args.getOrElse("text",
          throw new BuildError("entropy: text= required"))
        val nd = m.args.getOrElse("round", "4").toInt
        if (nd < 0 || nd > 12)
          throw new BuildError(s"entropy: round in [0,12], got $nd")
        ctx.writeStream(m, df.withColumn(
          m.args.getOrElse("col", "entropy"),
          round(graft.functions.TextExpr.charEntropy(col(text)), nd)), RowType)
      }),

    // Real BPE subword tokenization (operators/Bpe.scala): trains the
    // merge table from the stream itself at build time (one
    // distributed word-count agg + the driver-side Sennrich merge
    // loop) and appends the subword token array. For a pre-trained
    // table, chain from a stream that carries the training text.
    Registered("bpe", RowType, RowType,
      "in=STREAM:text=COL:merges=N[:col=tokens][:maxvocab=50000]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val text = m.args.getOrElse("text",
          throw new BuildError("bpe: text= required"))
        val nm = m.args.getOrElse("merges",
          throw new BuildError("bpe: merges= required")).toInt
        if (nm < 1 || nm > 100000)
          throw new BuildError(s"bpe: merges in [1,100000], got $nm")
        val maxVocab = m.args.getOrElse("maxvocab", "50000").toInt
        val table = graft.operators.Bpe.train(df, text, nm, maxVocab)
        ctx.log("bpe", s"trained ${table.size} merges")
        ctx.writeStream(m, df.withColumn(
          m.args.getOrElse("col", "tokens"),
          graft.operators.Bpe.encode(col(text), table)), RowType)
      }),

    // Gopher-style quality gates (q219): appends per-rule booleans and
    // a `keep` flag, or filters to survivors with drop. Integer
    // cross-multiply thresholds — see the q219 scaladoc.
    Registered("qualitygate", RowType, RowType,
      "in=STREAM:text=COL[:minwords=25][:maxwords=100000]" +
        "[:mincompress=R][:maxcompress=R][:drop]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val text = m.args.getOrElse("text",
          throw new BuildError("qualitygate: text= required"))
        val minW = m.args.getOrElse("minwords", "25").toInt
        val maxW = m.args.getOrElse("maxwords", "100000").toInt
        if (minW < 1 || maxW < minW)
          throw new BuildError(
            s"qualitygate: need 1 <= minwords <= maxwords, got $minW..$maxW")
        // Deflate compression-ratio rule (q278's kernel): docs whose
        // DEFLATE-ratio falls below mincompress= are boilerplate/
        // templated (too compressible); above maxcompress= they are
        // binary junk (incompressible). Bounds are decimal ratios,
        // gated by exact integer cross-multiply at e6 scale — no
        // float enters the verdict.
        def e6(k: String): Option[Long] = m.args.get(k).map { v =>
          try (BigDecimal(v) * 1000000).toLongExact
          catch { case _: Exception =>
            throw new BuildError(s"qualitygate: $k= must be a decimal " +
              s"ratio with <= 6 fractional digits, got '$v'") }
        }
        val minC = e6("mincompress")
        val maxC = e6("maxcompress")
        val compressRules: Seq[org.apache.spark.sql.Column] =
          if (minC.isEmpty && maxC.isEmpty) Seq.empty
          else {
            val dl = graft.functions.DeflateKernel.deflateLenCol(col(text)) *
              lit(1000000L)
            val nb = octet_length(col(text)).cast("long")
            minC.map(v => dl >= lit(v) * nb).toSeq ++
              maxC.map(v => dl <= lit(v) * nb).toSeq
          }
        val keep = (graft.functions.TextFunctions
          .gopherRules(col(text), minW, maxW)
          .map(_._2) ++ compressRules).reduce(_ && _)
        val out =
          if (m.args.contains("drop")) df.filter(keep)
          else df.withColumn("keep", keep)
        ctx.writeStream(m, out, RowType)
      }),

    // Gopher repetition filters (q245): duplicate-line and repeated
    // n-gram character-mass gates (thresholds 0.30/0.20/0.20/0.18/0.15
    // as integer cross-multiplies; dup-5 uses the position-masked
    // published metric). Appends the exact stat columns and `keep`, or
    // filters with drop. Zero shuffles — one codegen kernel call per
    // row (RepetitionKernel).
    Registered("repetition", RowType, RowType,
      "in=STREAM:text=COL[:drop]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val text = m.args.getOrElse("text",
          throw new BuildError("repetition: text= required"))
        val stats = graft.functions.TextFunctions.repetitionStats(col(text))
        val st = stats.toMap
        val keep = !(st("dup_lines") * 10 > st("n_lines") * 3) &&
          !(st("dup_line_chars") * 5 > st("line_chars")) &&
          !(st("top2_num") * 5 > st("gram_den")) &&
          !(st("top3_num") * 100 > st("gram_den") * 18) &&
          !(st("dup5_masked") * 100 > st("gram_den") * 15)
        val out =
          if (m.args.contains("drop")) df.filter(keep)
          else stats.foldLeft(df) { case (d, (nm, c)) => d.withColumn(nm, c) }
            .withColumn("keep", keep)
        ctx.writeStream(m, out, RowType)
      }),

    // HTML→main-content extraction (q249, VERDICT r15 #7): strip
    // script/style/comments, segment at block tags, keep blocks by
    // the jusText length + link-density gate — one codegen'd kernel
    // pass per page (HtmlKernel). The :stats flag keeps the page
    // stats; the default replaces the html column with title +
    // main_text (ADVICE r16: the comment used to say cols=).
    Registered("htmlextract", RowType, RowType,
      "in=STREAM:html=COL[:minchars=25][:linkden=3][:stats]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val html = m.args.getOrElse("html",
          throw new BuildError("htmlextract: html= required"))
        val minChars = m.args.get("minchars").map(_.toInt).getOrElse(25)
        val linkDen = m.args.get("linkden").map(_.toInt).getOrElse(3)
        val fields = graft.functions.TextFunctions.htmlExtract(
          col(html), minChars, linkDen)
        val withAll = fields.foldLeft(df) {
          case (d, (nm, c)) => d.withColumn(nm, c)
        }
        val out =
          if (m.args.contains("stats")) withAll
          else withAll.drop(html)
            .drop("n_blocks", "kept_blocks", "text_chars", "kept_chars",
              "link_chars")
        ctx.writeStream(m, out, RowType)
      }),

    // Per-group n-gram diversity report (q212): type/token ratio.
    Registered("diversity", RowType, RowType,
      "in=STREAM:group=COL:text=COL[:n=3]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val group = m.args.getOrElse("group",
          throw new BuildError("diversity: group= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("diversity: text= required"))
        val ng = m.args.getOrElse("n", "3").toInt
        if (ng < 1 || ng > 8)
          throw new BuildError(s"diversity: n in [1,8], got $ng")
        val out = df
          .select(col(group),
            explode(graft.functions.TextExpr.wordNgrams(col(text), ng))
              .as("__g"))
          .groupBy(col(group))
          .agg(count(lit(1)).as("total_ngrams"),
            countDistinct(col("__g")).as("distinct_ngrams"))
          .withColumn("diversity", round(
            col("distinct_ngrams").cast("double") / col("total_ngrams"), 6))
        ctx.writeStream(m, out, RowType)
      }),

    // Zipf rank-frequency slope per group (q217): power-law corpus
    // health via quantized-decimal OLS over the top-R vocabulary.
    Registered("zipf", RowType, RowType,
      "in=STREAM:group=COL:text=COL[:top=100]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val group = m.args.getOrElse("group",
          throw new BuildError("zipf: group= required"))
        val text = m.args.getOrElse("text",
          throw new BuildError("zipf: text= required"))
        val top = m.args.getOrElse("top", "100").toInt
        if (top < 3)
          throw new BuildError(s"zipf: top must be >= 3, got $top")
        import org.apache.spark.sql.expressions.Window
        val freq = df
          .select(col(group), explode(split(col(text), " ")).as("__w"))
          .groupBy(col(group), col("__w")).agg(count(lit(1)).as("__f"))
        val ranked = freq.withColumn("__r", row_number().over(
            Window.partitionBy(col(group))
              .orderBy(col("__f").desc, col("__w").asc)))
          .filter(col("__r") <= top)
        val qx = log(col("__r").cast("double")).cast("decimal(20,10)")
        val qy = log(col("__f").cast("double")).cast("decimal(20,10)")
        val terms = ranked.select(col(group), qx.as("qx"), qy.as("qy"),
          (qx.cast("double") * qy.cast("double"))
            .cast("decimal(30,12)").as("qxy"),
          (qx.cast("double") * qx.cast("double"))
            .cast("decimal(30,12)").as("qxx"))
        val out = terms.groupBy(col(group)).agg(
            count(lit(1)).as("n"),
            sum(col("qx")).as("__sx"), sum(col("qy")).as("__sy"),
            sum(col("qxy")).as("__sxy"), sum(col("qxx")).as("__sxx"))
          // 1-term vocabulary → slope denominator exactly 0 (0/0 NaN
          // row); OLS needs ≥ 2 ranked terms (ADVICE r11)
          .filter(col("n") >= 2)
          .select(col(group), col("n"),
            round((col("n") * col("__sxy").cast("double")
                - col("__sx").cast("double") * col("__sy").cast("double"))
              / (col("n") * col("__sxx").cast("double")
                - col("__sx").cast("double") * col("__sx").cast("double")),
              4).as("slope"))
        ctx.writeStream(m, out, RowType)
      }),

    // Heaps'-law vocabulary-growth exponent per group (q227): V=K·Tᵝ
    // fitted over doc-id-range bucket growth points — Zipf's
    // companion power law; β well below ~0.5 flags templated or
    // repetitive corpora. Emits (group, n, beta, ln_k).
    Registered("heaps", RowType, RowType,
      "in=STREAM:group=COL:id=COL:text=COL[:buckets=32]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"heaps: $k= required"))
        val (group, id, text) = (req("group"), req("id"), req("text"))
        val nb = m.args.getOrElse("buckets", "32").toInt
        if (nb < 2 || nb > 4096)
          throw new BuildError(s"heaps: buckets in [2,4096], got $nb")
        import org.apache.spark.sql.expressions.Window
        val d = df.select(col(group).as("__g"), col(id).as("__id"),
          col(text).as("__t"))
        val mx = d.groupBy(col("__g")).agg(max(col("__id")).as("__mx"))
        // Bucketing (ADVICE r13 + r14): the canonical form is the
        // product (__id * nb) div (__mx + 1) — exactly nb buckets,
        // and exactly what the q227 oracle replays — but it overflows
        // Long for ids above Long.MaxValue/nb (hash-derived ids are
        // plausible inputs to a generic module). Guard by RANGE, not
        // by formula: groups whose max id is product-safe use the
        // product form (bit-equal to q227); only a group with
        // mx >= Long.MaxValue/nb falls back to width division, which
        // may produce fewer than nb buckets for small ranges — an
        // impossibility on the fallback path (mx is astronomically
        // large there), so the two forms never diverge in practice.
        // Negative ids would silently corrupt first-occurrence
        // buckets in either form — asserted out loudly.
        val safeMx = Long.MaxValue / nb
        val db = d.join(broadcast(mx), "__g")
          .filter(assert_true(col("__id") >= 0,
            lit("heaps: id must be >= 0")).isNull)
          .withColumn("__b", expr(
            s"CASE WHEN __mx < ${safeMx}L THEN (__id * $nb) div (__mx + 1) " +
              s"ELSE __id div ((__mx div $nb) + 1) END"))
        val toks = db.groupBy(col("__g"), col("__b"))
          .agg(sum(size(split(col("__t"), " ")).cast("long")).as("__nt"))
        val nv = db
          .select(col("__g"), col("__b"),
            explode(split(col("__t"), " ")).as("__w"))
          .groupBy(col("__g"), col("__w")).agg(min(col("__b")).as("__fb"))
          .groupBy(col("__g"), col("__fb")).agg(count(lit(1)).as("__nv"))
          .withColumnRenamed("__fb", "__b")
        val w = Window.partitionBy(col("__g")).orderBy(col("__b"))
        val cum = toks.join(nv, Seq("__g", "__b"), "left")
          .select(col("__g"), col("__b"), col("__nt"),
            coalesce(col("__nv"), lit(0L)).as("__nv"))
          .select(col("__g"),
            sum(col("__nt")).over(w).as("__ct"),
            sum(col("__nv")).over(w).as("__cv"))
          .filter(col("__ct") > 0 && col("__cv") > 0)
        val qx = log(col("__ct").cast("double")).cast("decimal(20,10)")
        val qy = log(col("__cv").cast("double")).cast("decimal(20,10)")
        val terms = cum.select(col("__g"), qx.as("qx"), qy.as("qy"),
          (qx.cast("double") * qy.cast("double"))
            .cast("decimal(30,12)").as("qxy"),
          (qx.cast("double") * qx.cast("double"))
            .cast("decimal(30,12)").as("qxx"))
        val slopeE = (col("n") * col("__sxy").cast("double")
            - col("__sx").cast("double") * col("__sy").cast("double")) /
          (col("n") * col("__sxx").cast("double")
            - col("__sx").cast("double") * col("__sx").cast("double"))
        val out = terms.groupBy(col("__g")).agg(
            count(lit(1)).as("n"),
            sum(col("qx")).as("__sx"), sum(col("qy")).as("__sy"),
            sum(col("qxy")).as("__sxy"), sum(col("qxx")).as("__sxx"))
          .filter(col("n") >= 2)
          .select(col("__g").as(group), col("n"),
            round(slopeE, 4).as("beta"),
            round((col("__sy").cast("double")
              - slopeE * col("__sx").cast("double")) / col("n"), 4)
              .as("ln_k"))
        ctx.writeStream(m, out, RowType)
      }),

    // First-occurrence precedence mining per actor (q228): for each
    // type pair, how many actors saw a's first occurrence before
    // b's. Emits (ta, tb, n_ab, n_ba, n_both, ratio).
    Registered("precedence", RowType, RowType,
      "in=STREAM:actor=COL:type=COL:order=COL[,COL...]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"precedence: $k= required"))
        val actor = req("actor")
        val typ = req("type")
        val ord = req("order").split(",").toSeq.map(_.trim)
          .filter(_.nonEmpty).map(col)
        if (ord.isEmpty)
          throw new BuildError("precedence: order= needs >= 1 column")
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col(actor)).orderBy(ord: _*)
        val f = df.withColumn("__rn", row_number().over(w))
          .groupBy(col(actor).as("__a"), col(typ).as("__t"))
          .agg(min(col("__rn")).as("__pos"))
        val l = f.select(col("__a"), col("__t").as("ta"),
          col("__pos").as("__pa"))
        val r = f.select(col("__a"), col("__t").as("tb"),
          col("__pos").as("__pb"))
        val out = l.join(r, "__a")
          .filter(col("ta") < col("tb"))
          .groupBy(col("ta"), col("tb"))
          .agg(sum(when(col("__pa") < col("__pb"), 1L).otherwise(0L))
              .as("n_ab"),
            sum(when(col("__pb") < col("__pa"), 1L).otherwise(0L))
              .as("n_ba"),
            count(lit(1)).as("n_both"))
          .withColumn("ratio",
            round(col("n_ab").cast("double") / col("n_both"), 6))
        ctx.writeStream(m, out, RowType)
      }),

    // k-NN majority-vote classification from the DSL (q180): in= the
    // labeled corpus, queries= the stream to classify; emits
    // (query_id, predicted).
    Registered("knnclassify", RowType, RowType,
      "in=STREAM:queries=STREAM:key=COL:emb=COL:label=COL:k=5:out=STREAM",
      (ctx, m) => {
        val corpus = ctx.readStream(m, RowType)
        val qname = m.args.getOrElse("queries",
          throw new BuildError("knnclassify: queries= required"))
        val (qDf, qt) = ctx.streams.getOrElse(qname,
          throw new BuildError(s"knnclassify: unknown stream '$qname'"))
        if (qt != RowType)
          throw new BuildError(s"knnclassify: '$qname' is not a row stream")
        ctx.readers(qname) += 1
        val k = m.args.getOrElse("k", "5").toInt
        if (k < 1) throw new BuildError(s"knnclassify: k must be >= 1, got $k")
        ctx.writeStream(m, graft.operators.Similarity.knnClassify(
          corpus, qDf,
          m.args.getOrElse("key",
            throw new BuildError("knnclassify: key= required")),
          m.args.getOrElse("emb",
            throw new BuildError("knnclassify: emb= required")),
          m.args.getOrElse("label",
            throw new BuildError("knnclassify: label= required")), k), RowType)
      }),

    // Distribution-drift family from the DSL (operators/Drift.scala —
    // the q191/q198/q201/q202/q203 statistics as reusable modules; all
    // cell-tally plans, windows only over value domains, big sums in
    // decimal so nothing wraps at scale).
    Registered("psi", RowType, RowType,
      "in=STREAM:group=COL:bucket=EXPR:period=EXPR:threshold=0.10:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"psi: $k= required"))
        ctx.writeStream(m, graft.operators.Drift.psi(df, req("group"),
          expr(req("bucket")), expr(req("period")),
          m.args.getOrElse("threshold", "0.10").toDouble), RowType)
      }),

    Registered("ks", RowType, RowType,
      "in=STREAM:group=COL:value=EXPR:period=EXPR:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"ks: $k= required"))
        ctx.writeStream(m, graft.operators.Drift.ks(df, req("group"),
          expr(req("value")), expr(req("period"))), RowType)
      }),

    Registered("welch", RowType, RowType,
      "in=STREAM:group=COL:value=EXPR:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"welch: $k= required"))
        ctx.writeStream(m, graft.operators.Drift.welch(df, req("group"),
          expr(req("value"))), RowType)
      }),

    Registered("logit", RowType, RowType,
      "in=STREAM:label=EXPR:features=EXPR,...:iters=N:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"logit: $k= required"))
        // feature exprs are comma-separated; an intercept column is
        // prepended (the operator itself stays intercept-agnostic)
        val feats = org.apache.spark.sql.functions.lit(1.0) +:
          req("features").split(",").map(_.trim).filter(_.nonEmpty)
            .toSeq.map(expr)
        val iters = m.args.getOrElse("iters", "2").toInt
        ctx.writeStream(m, graft.operators.Ops.logisticTrainIRLS(
          df, feats, expr(req("label")), iters), RowType)
      }),

    // Bradley-Terry preference strengths (q248): fit pairwise-contest
    // rows to per-item scores by Hunter's MM with add-half smoothing.
    Registered("btrank", RowType, RowType,
      "in=STREAM:winner=COL:loser=COL[:iters=8]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"btrank: $k= required"))
        val iters = m.args.getOrElse("iters", "8").toInt
        ctx.writeStream(m, graft.operators.Ops.bradleyTerry(
          df, req("winner"), req("loser"), iters), RowType)
      }),

    Registered("gini", RowType, RowType,
      "in=STREAM:key=COL:value=EXPR:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"gini: $k= required"))
        ctx.writeStream(m, graft.operators.Drift.gini(df, req("key"),
          expr(req("value"))), RowType)
      }),

    // Cohen's kappa (q247): chance-corrected inter-rater agreement
    // between two categorical columns, optionally per group.
    Registered("kappa", RowType, RowType,
      "in=STREAM:a=COL:b=COL[:group=COL,...]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"kappa: $k= required"))
        val groups = m.args.get("group").toSeq
          .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
        ctx.writeStream(m, graft.operators.Drift.cohenKappa(
          df, req("a"), req("b"), groups), RowType)
      }),

    // Krippendorff's alpha (q257): the multi-rater generalization of
    // kappa — ratings arrive LONG (one row per rating), any number of
    // raters per unit, units with one rating are excluded per the
    // missing-data rule.
    Registered("kripp", RowType, RowType,
      "in=STREAM:unit=COL:value=COL[:group=COL,...]:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"kripp: $k= required"))
        val groups = m.args.get("group").toSeq
          .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
        ctx.writeStream(m, graft.operators.Drift.krippendorffAlpha(
          df, req("unit"), req("value"), groups), RowType)
      }),

    Registered("auc", RowType, RowType,
      "in=STREAM:score=EXPR:pos=EXPR:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"auc: $k= required"))
        ctx.writeStream(m, graft.operators.Drift.aucExact(df,
          expr(req("score")), expr(req("pos"))), RowType)
      }),

    // Touch attribution: in= the touch stream, conv= the conversion
    // stream (both need a ts column); emits (conversion id, key,
    // n_touches) for touches within `within` before each conversion.
    Registered("attribution", RowType, RowType,
      "in=STREAM:conv=STREAM:key=COL:id=COL:within=1 hour:out=STREAM",
      (ctx, m) => {
        val touches = ctx.readStream(m, RowType)
        val cname = m.args.getOrElse("conv",
          throw new BuildError("attribution: conv= required"))
        val (convDf, ct) = ctx.streams.getOrElse(cname,
          throw new BuildError(s"attribution: unknown stream '$cname'"))
        if (ct != RowType)
          throw new BuildError(s"attribution: '$cname' is not a row stream")
        ctx.readers(cname) += 1
        def req(k: String) = m.args.getOrElse(k,
          throw new BuildError(s"attribution: $k= required"))
        ctx.writeStream(m, graft.operators.Drift.attribution(
          touches, convDf, req("key"), req("id"),
          m.args.getOrElse("within", "1 hour")), RowType)
      }),

    // Embedding similarity family from the DSL (operators/Similarity —
    // the full ANN ladder brute→LSH→IVF→PQ plus semantic dedup and
    // hard-negative mining; in= is the corpus stream, queries=/
    // anchors= the second stream where applicable).
    Registered("cosinetopk", RowType, RowType,
      "in=STREAM:queries=STREAM:key=COL:emb=COL:k=5:out=STREAM",
      (ctx, m) => {
        val corpus = ctx.readStream(m, RowType)
        val qDf = secondRowStream(ctx, m, "cosinetopk", "queries")
        ctx.writeStream(m, graft.operators.Similarity.bruteForceTopK(
          corpus, qDf, reqArg(m, "cosinetopk", "key"),
          reqArg(m, "cosinetopk", "emb"),
          m.args.getOrElse("k", "5").toInt), RowType)
      }),

    Registered("anntopk", RowType, RowType,
      "in=STREAM:queries=STREAM:key=COL:emb=COL:k=5:nbits=16:bands=4:dim=64:multiprobe=1:maxbucket=1024:out=STREAM",
      (ctx, m) => {
        val corpus = ctx.readStream(m, RowType)
        val qDf = secondRowStream(ctx, m, "anntopk", "queries")
        ctx.writeStream(m, graft.operators.Similarity.annTopK(
          corpus, qDf, reqArg(m, "anntopk", "key"),
          reqArg(m, "anntopk", "emb"),
          m.args.getOrElse("k", "5").toInt,
          m.args.getOrElse("nbits", "16").toInt,
          m.args.getOrElse("bands", "4").toInt,
          m.args.getOrElse("dim", "64").toInt,
          m.args.getOrElse("multiprobe", "1").toInt,
          m.args.getOrElse("maxbucket", "1024").toInt), RowType)
      }),

    Registered("ivftopk", RowType, RowType,
      "in=STREAM:queries=STREAM:key=COL:emb=COL:k=5:nlist=16:nprobe=4:kmeans=0:out=STREAM",
      (ctx, m) => {
        val corpus = ctx.readStream(m, RowType)
        val qDf = secondRowStream(ctx, m, "ivftopk", "queries")
        ctx.writeStream(m, graft.operators.Similarity.ivfTopK(
          corpus, qDf, reqArg(m, "ivftopk", "key"),
          reqArg(m, "ivftopk", "emb"),
          m.args.getOrElse("k", "5").toInt,
          m.args.getOrElse("nlist", "16").toInt,
          m.args.getOrElse("nprobe", "4").toInt,
          m.args.getOrElse("kmeans", "0").toInt), RowType)
      }),

    Registered("pqtopk", RowType, RowType,
      "in=STREAM:queries=STREAM:key=COL:emb=COL:k=5:m=4:kcodes=16:out=STREAM",
      (ctx, m) => {
        val corpus = ctx.readStream(m, RowType)
        val qDf = secondRowStream(ctx, m, "pqtopk", "queries")
        ctx.writeStream(m, graft.operators.Similarity.pqTopK(
          corpus, qDf, reqArg(m, "pqtopk", "key"),
          reqArg(m, "pqtopk", "emb"),
          m.args.getOrElse("k", "5").toInt,
          m.args.getOrElse("m", "4").toInt,
          m.args.getOrElse("kcodes", "16").toInt), RowType)
      }),

    // Semantic benchmark decontamination (q282): flag train vectors
    // whose max cosine against the broadcast eval stream crosses
    // tau — the embedding-space sibling of `decontaminate`.
    Registered("embdecontam", RowType, RowType,
      "in=STREAM:eval=STREAM:key=COL:emb=COL:label=COL:tau=0.95:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val ename = m.args.getOrElse("eval",
          throw new BuildError("embdecontam: eval= required"))
        val (ev, et) = ctx.streams.getOrElse(ename,
          throw new BuildError(s"embdecontam: unknown stream '$ename'"))
        if (et != RowType)
          throw new BuildError(s"embdecontam: '$ename' is not a row stream")
        ctx.readers(ename) += 1
        ctx.writeStream(m, graft.operators.Similarity.embeddingDecontaminate(
          df, ev, reqArg(m, "embdecontam", "key"),
          reqArg(m, "embdecontam", "emb"),
          reqArg(m, "embdecontam", "label"),
          m.args.getOrElse("tau", "0.95").toDouble), RowType)
      }),

    Registered("semdedup", RowType, RowType,
      "in=STREAM:key=COL:emb=COL:k=8:tau=0.95:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        ctx.writeStream(m, graft.operators.Similarity.semDedup(
          df, reqArg(m, "semdedup", "key"), reqArg(m, "semdedup", "emb"),
          m.args.getOrElse("k", "8").toInt,
          m.args.getOrElse("tau", "0.95").toDouble), RowType)
      }),

    Registered("hardneg", RowType, RowType,
      "in=STREAM:anchors=STREAM:key=COL:emb=COL:label=COL:k=5:out=STREAM",
      (ctx, m) => {
        val corpus = ctx.readStream(m, RowType)
        val aDf = secondRowStream(ctx, m, "hardneg", "anchors")
        ctx.writeStream(m, graft.operators.Similarity.hardNegatives(
          corpus, aDf, reqArg(m, "hardneg", "key"),
          reqArg(m, "hardneg", "emb"), reqArg(m, "hardneg", "label"),
          m.args.getOrElse("k", "5").toInt), RowType)
      }),

    // Market-basket association rules from the DSL (apriori-pruned
    // frequent pairs with the hot-basket cap; Ops.associationRules).
    Registered("assocrules", RowType, RowType,
      "in=STREAM:basket=COL:item=COL:minsupport=2:minconfidence=0.0:maxbasket=65536:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        ctx.writeStream(m, graft.operators.Ops.associationRules(
          df, reqArg(m, "assocrules", "basket"),
          reqArg(m, "assocrules", "item"),
          m.args.getOrElse("minsupport", "2").toLong,
          m.args.getOrElse("minconfidence", "0.0").toDouble,
          m.args.getOrElse("maxbasket", "65536").toInt), RowType)
      }),

    // Curation tail from the DSL: greedy sequence packing, RRF pool
    // fusion, boilerplate gate, and PII redaction.
    Registered("seqpack", RowType, RowType,
      "in=STREAM:domain=COL:order=COL[,COL]:tokens=COL:bintokens=N:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val orderCols = reqArg(m, "seqpack", "order")
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(col)
        ctx.writeStream(m, graft.operators.Curation.packSequences(
          df, reqArg(m, "seqpack", "domain"), orderCols,
          reqArg(m, "seqpack", "tokens"),
          reqArg(m, "seqpack", "bintokens").toLong), RowType)
      }),

    Registered("rrf", RowType, RowType,
      "in=STREAM:pools=STREAM[,STREAM]:key=COL[,COL]:k0=60:out=STREAM",
      (ctx, m) => {
        // key= takes a comma list: (qid, doc) fuses per-query pools
        // in one pass (q238 / Curation.rrfFuseKeyed)
        val first = ctx.readStream(m, RowType)
        val others = m.args.getOrElse("pools", "")
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { n =>
            val (df, t) = ctx.streams.getOrElse(n,
              throw new BuildError(s"rrf: unknown stream '$n'"))
            if (t != RowType)
              throw new BuildError(s"rrf: '$n' is not a row stream")
            ctx.readers(n) += 1
            df
          }
        val keys = reqArg(m, "rrf", "key")
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        ctx.writeStream(m, graft.operators.Curation.rrfFuseKeyed(
          first +: others, keys,
          m.args.getOrElse("k0", "60").toInt), RowType)
      }),

    Registered("boilerplate", RowType, RowType,
      "in=STREAM:key=COL:text=COL:k=5:mindf=2:maxshare=0.5:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        ctx.writeStream(m, graft.operators.Curation.boilerplateShare(
          df, reqArg(m, "boilerplate", "key"),
          reqArg(m, "boilerplate", "text"),
          m.args.getOrElse("k", "5").toInt,
          m.args.getOrElse("mindf", "2").toLong,
          m.args.getOrElse("maxshare", "0.5").toDouble), RowType)
      }),

    Registered("pii", RowType, RowType,
      "in=STREAM:text=COL:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        ctx.writeStream(m, graft.operators.Curation.redactPii(
          df, reqArg(m, "pii", "text")), RowType)
      }),

    // Mixed-corpus media near-dup pairs from the DSL: sniff each
    // payload, dispatch stills/WAV to the banded-hamming fingerprint
    // join and MJPEG/AVI to the positional frame-hash join, union the
    // pair sets with a kind tag (Multimodal.mediaDuplicatePairs —
    // never all-pairs on media; modalities cannot cross-match).
    Registered("mediadedup", RowType, RowType,
      "in=STREAM:key=COL:col=content:maxdist=3:minshared=3:maxbucket=256:out=STREAM",
      (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val key = m.args.getOrElse("key",
          throw new BuildError("mediadedup: key= required"))
        ctx.writeStream(m, graft.multimodal.Multimodal.mediaDuplicatePairs(
          df, key, m.args.getOrElse("col", "content"),
          maxDist = m.args.getOrElse("maxdist", "3").toInt,
          minShared = m.args.getOrElse("minshared", "3").toInt,
          maxBucket = m.args.getOrElse("maxbucket", "256").toInt), RowType)
      }),

    // Resample still images (bilinear, re-encoded PNG).
    Registered("mediaresize", RowType, RowType,
      "in=STREAM:w=W:h=H:col=content:out=STREAM", (ctx, m) => {
        val df = ctx.readStream(m, RowType)
        val w = m.args.getOrElse("w",
          throw new BuildError("mediaresize: w= required")).toInt
        val h = m.args.getOrElse("h",
          throw new BuildError("mediaresize: h= required")).toInt
        if (w <= 0 || h <= 0)
          throw new BuildError(s"mediaresize: w/h must be > 0, got ${w}x$h")
        ctx.writeStream(m, graft.multimodal.Multimodal.resize(
          df, w, h, m.args.getOrElse("col", "content")), RowType)
      }),

    Registered("exec", RawType, RawType,
      "in=STREAM:cmd=COMMAND:out=STREAM", (ctx, m) => {
        // Reference TODO:31-32: "a module to run external programs
        // diverting stdin/stdout from the data flow streams". The
        // Spark-native shape is RDD.pipe (the Hadoop-streaming model):
        // ONE subprocess per partition, stream lines to its stdin,
        // read transformed lines from its stdout — the external
        // program runs distributed next to the data instead of forcing
        // a driver-side funnel. A non-zero exit kills the task (and so
        // the job) loudly. Scale: subprocess count = partition count,
        // payload never collects.
        val df = ctx.readStream(m, RawType)
        val cmd = m.args.getOrElse("cmd",
          throw new BuildError("exec: cmd= required"))
        import ctx.spark.implicits._
        val piped = df.select(col(df.columns.head).cast("string")).as[String]
          .rdd.pipe(Seq("/bin/sh", "-c", cmd)).toDF("col1")
        ctx.writeStream(m, piped, RawType)
        ctx.log("exec", s"pipe partitions through: $cmd")
      }),

    // Reference TODO:58-59: "TCP network modules: client and server.
    // Both could be used as input or output" — tcpread/tcpwrite each
    // take client (host=+port=) or server (listen=) mode = all four
    // combinations. A TCP endpoint is a single-point line stream, so
    // like `stdin` the read happens driver-side at build time (and the
    // write funnels through toLocalIterator — never a full collect);
    // distribution begins one module downstream. One-shot accept:
    // serve one peer, then close (the reference's pump model).
    Registered("tcpread", NoneType, RawType,
      "host=H:port=P|listen=PORT:out=STREAM", (ctx, m) => {
        val sock = tcpConnect(ctx, m, "tcpread")
        val lines =
          try {
            val br = new java.io.BufferedReader(new java.io.InputStreamReader(
              sock.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
            Iterator.continually(br.readLine()).takeWhile(_ != null).toVector
          } finally sock.close()
        import ctx.spark.implicits._
        ctx.writeStream(m, lines.toDF("col1"), RawType)
        ctx.log("tcpread", s"read ${lines.size} lines")
      }),

    Registered("tcpwrite", RawType, NoneType,
      "in=STREAM:host=H:port=P|listen=PORT", (ctx, m) => {
        val df = ctx.readStream(m, RawType)
        ctx.addSink(m.raw, () => {
          val sock = tcpConnect(ctx, m, "tcpwrite")
          try {
            val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
              sock.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
            var n = 0L
            val it = df.select(col(df.columns.head).cast("string")).toLocalIterator()
            while (it.hasNext) {
              val s = it.next().getString(0)
              w.write(if (s == null) "" else s); w.write("\n"); n += 1
            }
            w.flush()
            n
          } finally sock.close()
        })
      }),

    chartModule
  )

  // lazy: defined below the `modules` Seq that references it
  private lazy val chartModule: Registered =
    Registered("chartwrite", RowType, NoneType,
      "in=STREAM:out=FILE.svg:type=bar|line:x=COL:y=COL:title=T:maxpoints=N",
      (ctx, m) => {
        // Reference TODO (final item): "a graph module to extract data
        // and create a chart". SVG text out, zero dependencies. A
        // chart is a bounded artifact, so the collect is capped HARD:
        // aggregate/sample upstream in the distributed plan, render at
        // most maxpoints (default 1000) here — one row over the cap
        // aborts loudly instead of silently truncating the picture.
        val df = ctx.readStream(m, RowType)
        val path = m.args.getOrElse("out",
          throw new BuildError("chartwrite: out= required"))
        val kind = m.args.getOrElse("type", "bar")
        if (kind != "bar" && kind != "line")
          throw new BuildError(s"chartwrite: type must be bar|line, got $kind")
        val xCol = m.args.getOrElse("x", df.columns.head)
        val yCol = m.args.getOrElse("y",
          df.columns.lift(1).getOrElse(throw new BuildError(
            "chartwrite: y= required when the stream has one column")))
        val cap = m.args.getOrElse("maxpoints", "1000").toInt
        val title = m.args.getOrElse("title", s"$yCol by $xCol")
        ctx.addSink(m.raw, () => {
          val rows = df.select(col(xCol).cast("string"),
              col(yCol).cast("double"))
            .limit(cap + 1).collect()
          if (rows.length > cap)
            throw new BuildError(
              s"chartwrite: stream exceeds maxpoints=$cap — aggregate or " +
                "sample upstream (a chart with more points than pixels " +
                "is not a chart)")
          val pts = rows.toSeq.map(r =>
            (Option(r.getString(0)).getOrElse(""),
              if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
          val svg = if (kind == "line") graft.sinks.SvgChart.line(pts, title)
                    else graft.sinks.SvgChart.bar(pts, title)
          val f = new java.io.File(path)
          Option(f.getParentFile).foreach(_.mkdirs())
          java.nio.file.Files.writeString(f.toPath, svg)
          pts.size.toLong
        })
      })

  /** Client (host=+port=) or one-shot server (listen=) socket for the
    * tcp modules. Server accept is bounded by a 60 s timeout so a
    * never-arriving peer fails loudly instead of hanging the build.
    */
  private def tcpConnect(ctx: Context, m: ModuleSpec,
                         mod: String): java.net.Socket =
    m.args.get("listen") match {
      case Some(p) =>
        val srv = new java.net.ServerSocket(p.toInt)
        try {
          srv.setSoTimeout(60000)
          ctx.log(mod, s"listening on ${srv.getLocalPort}")
          srv.accept()
        } finally srv.close()
      case None =>
        val host = m.args.getOrElse("host",
          throw new BuildError(s"$mod: host=+port= or listen= required"))
        val port = m.args.getOrElse("port",
          throw new BuildError(s"$mod: port= required with host=")).toInt
        new java.net.Socket(host, port)
    }

  val registry: Map[String, Registered] = modules.map(r => r.name -> r).toMap

  /** The `--listmodules` table (reference dbitool.pl:2972-2998). */
  def listModules: Seq[(String, String, String, String)] =
    modules.sortBy(_.name).map(r =>
      (r.name, r.inType.label, r.outType.label, r.argHelp))

  /** Expand `@file` shortcuts (dbitool.pl:93-103): `in=@f` prepends a
    * reader word, `out=@f` appends a writer word.
    */
  private[pipeline] def expandAtFiles(words: Seq[String]): Seq[String] =
    words.flatMap { w =>
      val spec = parseWord(w)
      (spec.args.get("in"), spec.args.get("out")) match {
        case (Some(f), _) if f.startsWith("@") =>
          val path = f.drop(1)
          val s = s"__at_in_$path"
          Seq(s"fileread:in=$path:out=$s",
            w.replace(s"in=$f", s"in=$s"))
        case (_, Some(f)) if f.startsWith("@") =>
          val path = f.drop(1)
          val s = s"__at_out_$path"
          Seq(w.replace(s"out=$f", s"out=$s"),
            s"filewrite:in=$s:out=$path")
        case _ => Seq(w)
      }
    }

  case class RunResult(rowsWritten: Map[String, Long],
                       log: DataFrame,
                       streamStats: Map[String, Long])

  /** Build + validate + execute a pipeline. `stats=true` counts rows
    * through every named stream (extra actions — debugging aid, like
    * the reference's loglevel 2, dbitool.pl:815-818).
    */
  /** Raised when parse errors exceed the budget (reference `errorsize`
    * abort, dbitool.pl:234-243 — checked after the run rather than
    * mid-stream, since Spark executes whole stages).
    */
  final class ErrorBudgetExceeded(val count: Long, limit: Int,
                                  val sample: Seq[String])
    extends RuntimeException(
      s"$count rows hit the error channel (limit $limit); first: " +
        sample.take(3).mkString(" | "))

  def run(spark: SparkSession, words: Seq[String],
          stats: Boolean = false, errorSize: Int = 3,
          inputs: Map[String, DataFrame] = Map.empty,
          progress: Boolean = false): RunResult = {
    val ctx = build(spark, words, inputs, progress)
    val relayed = mutable.Set[String]()
    // Row counts observed DURING each sink's write (zero extra
    // actions); relayed to the log channel as each sink completes —
    // the reference-TODO progress info, at Spark's action granularity.
    def relayProgress(deadlineMs: Long): Unit = if (progress) {
      val until = System.currentTimeMillis() + deadlineMs
      ctx.observations.foreach { case (n, ob) =>
        if (!relayed(n)) {
          // the observation listener fires on the async bus right
          // after the action returns — bounded wait, never a block
          val m: Option[org.apache.spark.sql.Row] = ob.future.value match {
            case Some(scala.util.Success(row)) => Some(row)
            case _ =>
              val remaining = math.max(1L, until - System.currentTimeMillis())
              try Some(scala.concurrent.Await.result(ob.future,
                scala.concurrent.duration.Duration(remaining, "ms")))
              catch { case _: java.util.concurrent.TimeoutException => None }
          }
          m.foreach { row =>
            relayed += n
            ctx.log("progress", s"$n rows=${row.getAs[Long]("rows")}")
          }
        }
      }
    }
    val written = ctx.sinks.map { case (name, action) =>
      val rows = action()
      relayProgress(200L)
      name -> rows
    }.toMap
    relayProgress(2000L)

    // Error budget (reference default 3, dbitool.pl:39). Errors also
    // print to stderr when nothing consumed them — the reference
    // auto-wires error→stderr unconditionally (dbitool.pl:117-129).
    if (ctx.errorDfs.nonEmpty) {
      val errs = ctx.errorStream.limit(errorSize + 1).collect()
      errs.foreach(r => System.err.println(s"error: [${r.getString(0)}] ${r.getString(1)}"))
      if (errs.length > errorSize)
        throw new ErrorBudgetExceeded(errs.length, errorSize,
          errs.map(_.getString(1)).toSeq)
    }

    // Drain-after-EOF: the log stream materializes only after the data
    // sinks finish (reference dbitool.pl:245-252), then any deferred
    // `in=log` consumers build against it and run as a second wave.
    import spark.implicits._
    val logDf = ctx.logRows.toSeq.toDF("time", "mod", "msg")
    val logWritten: Map[String, Long] =
      if (ctx.logReaders.isEmpty) Map.empty
      else {
        ctx.streams("log") = (logDf, RowType)
        ctx.sinks.clear()
        ctx.lastOut = None
        ctx.logReaders.foreach { case (spec, _) =>
          registry(spec.name).build(ctx, spec)
        }
        ctx.sinks.map { case (name, action) => name -> action() }.toMap
      }

    val stat =
      if (stats) ctx.streams.collect {
        // unbounded streams have no count(); stats covers bounded only
        case (n, (df, _)) if !df.isStreaming => n -> df.count()
      }.toMap
      else Map.empty[String, Long]
    RunResult(written ++ logWritten, logDf, stat)
  }

  /** Parse + build + validate without executing sinks.
    *
    * Words whose input traces back to the `log` stream are deferred
    * (the whole downstream subtree, like the reference's setlog
    * marking, dbitool.pl:187-196) — they are built in `run` after the
    * data sinks finish.
    */
  def build(spark: SparkSession, words0: Seq[String],
            inputs: Map[String, DataFrame] = Map.empty,
            progress: Boolean = false): Context = {
    val ctx = new Context(spark)
    ctx.progressEnabled = progress
    // Externally-provided row streams (a MemoryStream in tests, any
    // DataFrame from library code): seeded with a writer so a module
    // can't shadow them, and subject to the same no-reader validation.
    inputs.foreach { case (n, df) =>
      ctx.streams(n) = (df, RowType)
      ctx.writers(n) += 1
    }
    val words = expandAtFiles(words0)
    ctx.log("dbitool", s"pipeline: ${words.mkString(" ")}")
    val logOuts = mutable.Set("log")
    val errorOuts = mutable.Set("error")
    val errorReaders = mutable.ArrayBuffer[ModuleSpec]()
    var prevChain: Option[String] = None // Some("log"|"error") when deferred
    words.foreach { w =>
      val spec = parseWord(w)
      val reg = registry.getOrElse(spec.name,
        throw new BuildError(s"unknown module '${spec.name}'"))
      val chain: Option[String] = spec.args.get("in") match {
        case Some(n) if logOuts.contains(n) => Some("log")
        case Some(n) if errorOuts.contains(n) => Some("error")
        case Some(_) => None
        case None => prevChain
      }
      // Strict arg validation (reference setup() dies on unmatched
      // args, dbitool.pl:663-681): every key must appear in argHelp.
      // split also on `|` so alternative-mode templates
      // (`host=H:port=P|listen=PORT`) contribute every key
      val allowed = reg.argHelp.split("[:\\[\\]|]").toSeq
        .flatMap(seg => "^\\w+".r.findFirstIn(seg)) .toSet ++ Set("in", "out")
      val unknown = spec.args.keySet -- allowed
      if (unknown.nonEmpty)
        throw new BuildError(
          s"${spec.name}: unknown arg(s) ${unknown.mkString(", ")} " +
            s"(accepted: ${allowed.toSeq.sorted.mkString(", ")})")
      chain match {
        case Some("log") =>
          ctx.logReaders += ((spec, spec.args.getOrElse("in", "log")))
          spec.args.get("out").foreach(logOuts += _)
        case Some("error") =>
          errorReaders += spec
          spec.args.get("out").foreach(errorOuts += _)
        case _ =>
          reg.build(ctx, spec)
      }
      prevChain = chain
    }
    // Error rows are plan-time data: the channel closes once all words
    // are parsed, so error consumers build now (the reference's
    // always-auto-wired error channel, dbitool.pl:117-129).
    if (errorReaders.nonEmpty) {
      ctx.streams("error") = (ctx.errorStream, RowType)
      ctx.lastOut = None
      errorReaders.foreach(spec => registry(spec.name).build(ctx, spec))
    }
    // Dangling-stream validation (reference streamlist->check,
    // dbitool.pl:581-591).
    ctx.streams.keys.foreach { n =>
      if (ctx.readers(n) == 0 && !n.startsWith("__at_"))
        throw new BuildError(s"stream '$n' has no reader")
    }
    ctx
  }
}
