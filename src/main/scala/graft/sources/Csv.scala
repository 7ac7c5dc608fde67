package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** CSV read options — the reference's `ReadOptions`
  * (reference: src/DataFrame/IO/CSV.hs:141-196). `dateFormat` is a Java
  * `DateTimeFormatter` pattern (Spark-idiomatic), not Haskell's
  * `Data.Time.Format` syntax — documented divergence. */
sealed trait HeaderSpec
case object UseFirstRow extends HeaderSpec
case object NoHeader extends HeaderSpec
final case class ProvideNames(names: Seq[String]) extends HeaderSpec

sealed trait TypeSpec
final case class InferFromSample(n: Int) extends TypeSpec
final case class SpecifyTypes(types: Seq[DataType]) extends TypeSpec
/** per-NAME column types (reference: IO/CSV.hs:141-196 keys options by
  * column name, not position); unknown names error, matching the
  * reference's failure on a spec for a column that doesn't exist. */
final case class SpecifyTypesByName(types: Map[String, DataType]) extends TypeSpec
case object NoInference extends TypeSpec

final case class CsvOptions(
    header: HeaderSpec = UseFirstRow,
    types: TypeSpec = InferFromSample(100),
    safeRead: Boolean = true,
    dateFormat: String = "yyyy-MM-dd",
    separator: Char = ',',
    numColumns: Option[Int] = None,
    missingIndicators: Seq[String] = Nil,
    /** keep rows that fail structural parse in this column (PERMISSIVE
      * mode) — the reference's `partiallyParsed` convention
      * (Operations/Core.hs:580-587). Requires an explicit column count
      * (ProvideNames / SpecifyTypes / a header row). */
    corruptColumn: Option[String] = None)

/** CSV / TSV source+sink (reference: src/DataFrame/IO/CSV.hs:206-459).
  *
  * Spark-first design: `spark.read.csv` supplies the distributed,
  * splittable scan (the reference's hand-rolled SIMD parser is Spark's
  * UnivocityParser here — SURVEY §3 "nothing to build"); this layer adds
  * the reference's semantics on top:
  *   - null-token normalization (Internal/Parsing.hs:15-20 `isNullish`
  *     plus user `missingIndicators`) when `safeRead`;
  *   - sample-based type inference with the reference's assumption
  *     ordering (Operations/Typing.hs:166-190): bool → int → double →
  *     date → text, where the SAMPLE picks the candidate chain and the
  *     FULL column must validate or fall through (Typing.hs:60-135).
  *
  * Scale posture: the sample is a bounded `limit(n).collect()` (driver);
  * full-column validation is ONE distributed aggregate pass; the final
  * cast is a per-row projection. No per-column jobs, no global shuffle.
  */
object Csv {

  /** Internal/Parsing.hs:15-20 (empty string is handled by Spark's
    * `nullValue` default, which already reads `""` as null). */
  val nullish: Seq[String] =
    Seq("Nothing", "NULL", " ", "nan", "null", "N/A", "NaN", "NAN", "NA")

  def readCsv(spark: SparkSession, path: String): DataFrame =
    read(spark, path, CsvOptions())

  def readTsv(spark: SparkSession, path: String): DataFrame =
    read(spark, path, CsvOptions(separator = '\t'))

  def readCsvWithOpts(spark: SparkSession, path: String, opts: CsvOptions): DataFrame =
    read(spark, path, opts)

  def read(spark: SparkSession, path: String, opts: CsvOptions): DataFrame = {
    val reader = spark.read
      .option("sep", opts.separator.toString)
      .option("header", opts.header == UseFirstRow)
      .option("mode", "PERMISSIVE")
    val raw = (opts.header, opts.corruptColumn) match {
      case (_, Some(cc)) =>
        // structural-error capture needs an explicit schema: every data
        // column as string plus the corrupt-record column.
        val names = opts.header match {
          case ProvideNames(ns) => ns
          case UseFirstRow =>
            spark.read.option("sep", opts.separator.toString)
              .option("header", true).csv(path).columns.toSeq
          case NoHeader =>
            spark.read.option("sep", opts.separator.toString)
              .csv(path).columns.indices.map(_.toString)
        }
        val schema = StructType(
          names.map(StructField(_, StringType)) :+ StructField(cc, StringType))
        reader.schema(schema)
          .option("columnNameOfCorruptRecord", cc)
          .csv(path)
      case (ProvideNames(ns), None) =>
        val d = reader.csv(path)
        // reference pads missing names with positional ones (CSV.hs:267-269)
        val names = ns ++ (ns.length until d.columns.length).map(_.toString)
        d.toDF(names: _*)
      case (NoHeader, None) =>
        val d = reader.csv(path) // _c0.._cN → "0".."N" (CSV.hs:259-262)
        d.toDF(d.columns.indices.map(_.toString): _*)
      case (UseFirstRow, None) => reader.csv(path)
    }
    val trimmed = opts.numColumns match {
      case Some(n) => raw.select(raw.columns.take(n).map(q): _*)
      case None => raw
    }
    val cleaned = normalizeNulls(trimmed, opts)
    opts.types match {
      case NoInference => cleaned
      case SpecifyTypes(ts) => castWithTypes(cleaned, ts, opts)
      case SpecifyTypesByName(ts) => castWithTypesByName(cleaned, ts, opts)
      case InferFromSample(n) => inferAndCast(cleaned, n, opts)
    }
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    write(df, path, ',')

  def writeTsv(df: DataFrame, path: String): Unit =
    write(df, path, '\t')

  /** Distributed CSV sink (reference: IO/CSV.hs:392-459 writes one file;
    * here each partition writes a part — the 100 TB posture. Use
    * `singleFile = true` for the reference's exact one-file layout). */
  def write(df: DataFrame, path: String, sep: Char = ',',
            singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite")
      .option("header", true)
      .option("sep", sep.toString)
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)
  }

  // ---- internals ---------------------------------------------------------

  private def q(name: String): Column = F.col(s"`$name`")

  private def normalizeNulls(df: DataFrame, opts: CsvOptions): DataFrame = {
    val dataCols = df.columns.filterNot(opts.corruptColumn.contains)
    val tokens =
      if (opts.safeRead) nullish ++ opts.missingIndicators
      else opts.missingIndicators
    if (tokens.isEmpty) df
    else df.select(df.columns.map { c =>
      if (dataCols.contains(c))
        F.when(q(c).isin(tokens: _*), F.lit(null)).otherwise(q(c)).as(c)
      else q(c)
    }.toSeq: _*)
  }

  /** positional SpecifyTypes (Typing.hs:parseWithTypes): cast column i to
    * types(i); unlisted columns stay string. */
  private def castWithTypes(df: DataFrame, ts: Seq[DataType], opts: CsvOptions): DataFrame =
    df.select(df.columns.zipWithIndex.map { case (c, i) =>
      if (i < ts.length && !opts.corruptColumn.contains(c))
        castTo(q(c), ts(i), opts.dateFormat).as(c)
      else q(c)
    }.toSeq: _*)

  /** by-name SpecifyTypes: cast the named columns, leave the rest as
    * string; an unknown name is an immediate error. */
  private def castWithTypesByName(df: DataFrame, ts: Map[String, DataType],
                                  opts: CsvOptions): DataFrame = {
    val unknown = ts.keys.filterNot(df.columns.contains)
    require(unknown.isEmpty,
      s"SpecifyTypesByName: no such column(s): ${unknown.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    df.select(df.columns.map { c =>
      ts.get(c) match {
        case Some(t) if !opts.corruptColumn.contains(c) =>
          castTo(q(c), t, opts.dateFormat).as(c)
        case _ => q(c)
      }
    }.toSeq: _*)
  }

  private def castTo(c: Column, t: DataType, fmt: String): Column = t match {
    case DateType => F.try_to_date(c, fmt)
    case BooleanType =>
      F.when(c.isin("True", "true", "TRUE"), F.lit(true))
        .when(c.isin("False", "false", "FALSE"), F.lit(false))
    case other => c.try_cast(other)
  }

  // the reference's per-type parse predicates (Typing.hs:60-135):
  // Haskell `readMaybe @Int` ≈ optional-sign integer; readDouble via
  // bytestring-lexing ≈ Spark's string→double cast; bool is the exact
  // True/true/TRUE family (Parsing.hs:22-27).
  private def parsableAs(c: Column, t: DataType, fmt: String): Column = t match {
    case BooleanType =>
      c.isin("True", "true", "TRUE", "False", "false", "FALSE")
    case LongType => c.rlike("^[+-]?[0-9]+$") && c.try_cast(LongType).isNotNull
    case DoubleType => c.try_cast(DoubleType).isNotNull
    case DateType => F.try_to_date(c, fmt).isNotNull
    case _ => F.lit(true)
  }

  /** Candidate chains per sample assumption (Typing.hs:166-190 +
    * handle*Assumption fallbacks). First fully-validating type wins;
    * none → text. */
  private def candidateChain(sample: Seq[String], fmt: String): Seq[DataType] = {
    val nonNull = sample.filter(_ != null)
    if (nonNull.isEmpty)
      // NoAssumption: decide from the full column, longest chain
      Seq(BooleanType, LongType, DoubleType, DateType)
    else if (nonNull.forall(s => Set("True", "true", "TRUE", "False", "false", "FALSE")(s)))
      Seq(BooleanType)
    else if (nonNull.forall(_.matches("^[+-]?[0-9]+$")))
      Seq(LongType, DoubleType) // IntAssumption falls back to double
    else if (nonNull.forall(parsesAsDouble))
      Seq(DoubleType)
    else if (nonNull.forall(s => parsesAsDate(s, fmt)))
      Seq(DateType)
    else Seq.empty // TextAssumption
  }

  private def parsesAsDouble(s: String): Boolean =
    try { s.trim.toDouble; true } catch { case _: NumberFormatException => false }

  private def parsesAsDate(s: String, fmt: String): Boolean =
    try {
      java.time.LocalDate.parse(s.trim,
        java.time.format.DateTimeFormatter.ofPattern(fmt)); true
    } catch { case _: Exception => false }

  private def inferAndCast(df: DataFrame, n: Int, opts: CsvOptions): DataFrame = {
    val dataCols = df.columns.filterNot(opts.corruptColumn.contains).toSeq
    val sampleRows = df.select(dataCols.map(q): _*).limit(n).collect()
    val chains: Map[String, Seq[DataType]] = dataCols.zipWithIndex.map {
      case (c, i) =>
        c -> candidateChain(sampleRows.toSeq.map(r =>
          if (r.isNullAt(i)) null else r.getString(i)), opts.dateFormat)
    }.toMap
    // ONE distributed pass: per (column, candidate) count of non-null
    // values that fail the parse — 0 failures ⇒ candidate validates.
    val checks: Seq[(String, DataType, Column)] = for {
      c <- dataCols
      t <- chains(c)
    } yield (c, t,
      F.sum(F.when(q(c).isNotNull && !parsableAs(q(c), t, opts.dateFormat), 1)
        .otherwise(0)).as(s"${c}__${t.simpleString}"))
    val decided: Map[String, DataType] =
      if (checks.isEmpty) Map.empty
      else {
        val row = df.agg(checks.head._3, checks.tail.map(_._3): _*).collect()(0)
        val fails = checks.zipWithIndex.map { case ((c, t, _), i) =>
          (c, t) -> (if (row.isNullAt(i)) 0L else row.getLong(i))
        }.toMap
        dataCols.flatMap { c =>
          chains(c).find(t => fails((c, t)) == 0L).map(c -> _)
        }.toMap
      }
    df.select(df.columns.map { c =>
      decided.get(c) match {
        case Some(t) => castTo(q(c), t, opts.dateFormat).as(c)
        case None => q(c)
      }
    }.toSeq: _*)
  }
}
