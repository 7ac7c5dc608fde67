package graft.queries

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.{functions => gf}
import graft.sources.{Avro, Csv, Json, Orc, Xml}
import Sql.dsum

/** I/O-surface coverage: CSV round-trip + null-token semantics.
  *
  * The oracle never reads our CSV files — each query writes a slice out
  * through the engine's own writer, reads it back through the engine's
  * reader (inference on), and the ORACLE recomputes the expected result
  * straight from the parquet table. A type-inference or null-token bug
  * shows up as a schema/hash mismatch.
  */
object Io {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_$name"

  val registry: Seq[(String, Q)] = Seq(

    // --- CSV write → read-with-inference round trip -------------------------
    // long / double / string / date columns all survive the text round trip
    // with the types the reference's sample-inference would assign
    // (IO/CSV.hs:206-301, Operations/Typing.hs:25-63).
    "q32_csv_roundtrip" -> Q(
      (s, d) => {
        val out = tmp("q32_csv")
        val slice = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 2000)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_returnflag"),
            col("l_shipdate").cast("date").as("l_shipdate"))
        Csv.writeCsv(slice, out)
        val back = Csv.readCsv(s, out)
        // inference must land DateType here (schema-asserted in CsvSpec);
        // surface as timestamp for the driver's pandas-level compare
        assert(back.schema("l_shipdate").dataType ==
          org.apache.spark.sql.types.DateType, "date inference regressed")
        // total order over ALL output columns: (l_orderkey, l_linenumber)
        // is not unique in the synthetic data (sf1 lesson, q02 convention)
        back.withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
          .orderBy("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_returnflag", "l_shipdate")
      },
      Some("""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
        CAST(l_linenumber AS BIGINT) AS l_linenumber,
        l_quantity, l_extendedprice, l_returnflag,
        CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS l_shipdate
        FROM lineitem WHERE l_orderkey < 2000
        ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
          l_returnflag, l_shipdate""")),

    // --- null tokens (isNullish) + inference over a column with nulls -------
    // Inject the reference's null indicators as literal text, round-trip
    // through CSV, and verify safeRead turns them into nulls while the
    // remaining values still infer as double (Internal/Parsing.hs:15-20).
    "q33_csv_nulls" -> Q(
      (s, d) => {
        val out = tmp("q33_csv")
        val k = col("c_custkey")
        val src = Tables.customer(s, d).select(
          k,
          when(k % 7 === 0, lit("NA")).when(k % 11 === 0, lit("null"))
            .otherwise(col("c_name")).as("name_raw"),
          when(k % 5 === 0, lit("N/A"))
            .otherwise(col("c_acctbal").cast("string")).as("bal_raw"))
        Csv.writeCsv(src, out)
        val back = Csv.readCsv(s, out)
        back.agg(
          gf.countAll.as("n_rows"),
          count(col("name_raw")).as("n_names"),
          count(when(col("name_raw").isNull, 1)).as("n_name_null"),
          count(when(col("bal_raw").isNull, 1)).as("n_bal_null"),
          gf.dsumD(col("bal_raw")).as("sum_bal"))
      },
      Some(s"""SELECT COUNT(*) AS n_rows,
        COUNT(CASE WHEN c_custkey % 7 <> 0 AND c_custkey % 11 <> 0 THEN 1 END) AS n_names,
        COUNT(CASE WHEN c_custkey % 7 = 0 OR c_custkey % 11 = 0 THEN 1 END) AS n_name_null,
        COUNT(CASE WHEN c_custkey % 5 = 0 THEN 1 END) AS n_bal_null,
        ${dsum("CASE WHEN c_custkey % 5 <> 0 THEN c_acctbal END")} AS sum_bal
        FROM customer""")),

    // --- JSON round trip: JSONL write → schema-inferred read ---------------
    // (readJSONL is the splittable scale path; the reference's
    // top-level-array readJSON is covered in JsonSpec.)
    "q34_json" -> Q(
      (s, d) => {
        val out = tmp("q34_json")
        val slice = Tables.events(s, d)
          .filter(col("event_id") % 10 === 0)
          .select("event_id", "user_id", "event_type", "value")
        Json.writeJSONL(slice, out)
        Json.readJSONL(s, out)
          .groupBy("event_type")
          .agg(gf.countAll.as("n"),
            max(col("user_id")).as("max_user"),
            gf.dsumD(col("value")).as("total_value"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, COUNT(*) AS n, MAX(user_id) AS max_user,
        ${dsum("value")} AS total_value
        FROM events WHERE event_id % 10 = 0
        GROUP BY event_type ORDER BY event_type""")),

    // --- ORC write → read round trip ----------------------------------------
    // Columnar-format parity beyond parquet: long / double / string /
    // date / timestamp all survive the ORC round trip with identical
    // values and types. The oracle never touches our ORC files — it
    // recomputes from parquet, so any ORC type-mapping drift fails the
    // hash match.
    "q70_orc_roundtrip" -> Q(
      (s, d) => {
        val out = tmp("q70_orc")
        val slice = Tables.orders(s, d)
          .filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderstatus"),
            col("o_orderdate").cast("timestamp").as("o_orderdate"))
        Orc.writeOrc(slice, out)
        val back = Orc.readOrc(s, out)
        back.groupBy("o_orderstatus")
          .agg(gf.countAll.as("n"),
            gf.dsumD(col("o_totalprice")).as("total"),
            max(col("o_orderdate")).as("last_date"),
            max(col("o_orderkey")).as("max_key"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
        ${dsum("o_totalprice")} AS total,
        MAX(CAST(o_orderdate AS TIMESTAMP)) AS last_date,
        MAX(o_orderkey) AS max_key
        FROM orders WHERE o_orderkey % 7 = 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // --- JDBC write → partitioned parallel read round trip ------------------
    // The reference's dataframe-persistent bridge (Persistent.hs:17-39)
    // through embedded Derby: toPersistent writes the table, the read
    // comes back through fromPersistentPartitioned (4 range-bounded
    // cursors — the cluster-parallel path, not the 1-cursor read). The
    // oracle recomputes from parquet, so any JDBC type-mapping drift
    // (BIGINT/DOUBLE/CLOB) fails the hash match.
    "q85_jdbc_roundtrip" -> Q(
      (s, d) => {
        val url = "jdbc:derby:memory:graft_q85;create=true"
        val slice = Tables.nation(s, d).select(
          col("n_nationkey").cast("long").as("nationkey"),
          col("n_name").as("name"),
          col("n_regionkey").cast("long").as("regionkey"))
        graft.sources.Jdbc.toPersistent(slice, url, "nation_rt",
          org.apache.spark.sql.SaveMode.Overwrite)
        graft.sources.Jdbc.fromPersistentPartitioned(s, url, "nation_rt",
            "nationkey", 0L, 25L, 4)
          .orderBy("nationkey")
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
        n_name AS name, CAST(n_regionkey AS BIGINT) AS regionkey
        FROM nation ORDER BY nationkey""")),

    // --- Avro write → read round trip ---------------------------------------
    // Row-format parity for the ingest edge (Kafka/log-shipper hand-offs):
    // long / double / string / date all survive through Avro's logical-type
    // mapping (date = int days, both directions). The oracle recomputes from
    // parquet, so any Avro serializer/deserializer drift fails the hash
    // match — the q70 ORC pattern with the date kept as DATE through the
    // file to exercise the logical type, surfaced as timestamp only for
    // the driver's pandas-level compare.
    "q144_avro_roundtrip" -> Q(
      (s, d) => {
        val out = tmp("q144_avro")
        val slice = Tables.orders(s, d)
          .filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderstatus"), col("o_orderdate").cast("date").as("o_orderdate"))
        Avro.writeAvro(slice, out)
        val back = Avro.readAvro(s, out)
        assert(back.schema("o_orderdate").dataType ==
          org.apache.spark.sql.types.DateType, "avro date logical type regressed")
        back.groupBy("o_orderstatus")
          .agg(gf.countAll.as("n"),
            gf.dsumD(col("o_totalprice")).as("total"),
            max(col("o_orderdate")).cast("timestamp").as("last_date"),
            max(col("o_orderkey")).as("max_key"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
        ${dsum("o_totalprice")} AS total,
        CAST(MAX(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS last_date,
        MAX(o_orderkey) AS max_key
        FROM orders WHERE o_orderkey % 5 = 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // --- XML write → schema-inferred read round trip ------------------------
    // Enterprise-feed parity (filings/dump archives): each row an element,
    // inference must restore long / double / string exactly — an escaping
    // bug (& < > in text) or element-inference drift fails the hash match.
    // The oracle recomputes from parquet and never touches the XML files.
    "q145_xml_roundtrip" -> Q(
      (s, d) => {
        val out = tmp("q145_xml")
        val slice = Tables.customer(s, d)
          .filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("c_mktsegment"))
        Xml.writeXml(slice, out)
        val back = Xml.readXml(s, out)
        assert(back.schema("c_custkey").dataType ==
          org.apache.spark.sql.types.LongType, "xml long inference regressed")
        back.groupBy("c_mktsegment")
          .agg(gf.countAll.as("n"),
            gf.dsumD(col("c_acctbal")).as("total_bal"),
            max(col("c_name")).as("max_name"),
            max(col("c_custkey")).as("max_key"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n,
        ${dsum("c_acctbal")} AS total_bal,
        MAX(c_name) AS max_name, MAX(c_custkey) AS max_key
        FROM customer WHERE c_custkey % 3 = 0
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""))
  )
}
