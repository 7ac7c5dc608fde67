package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Jdbc, Json}

/** JSON + JDBC source/sink semantics (reference IO/JSON.hs,
  * dataframe-persistent/IO/Persistent.hs). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._
  initLogs()

  test("readJSON: top-level array of objects, key union, numbers as double") {
    val dir = Files.createTempDirectory("graft_json")
    val p = dir.resolve("a.json")
    // second object misses 'x' and adds 'b' — schema is the key union
    Files.writeString(p,
      """[{"id": 1, "x": 1.5, "s": "a"},
         {"id": 2, "s": "b", "b": true}]""")
    val df = Json.readJSON(spark, p.toString)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // CTNumber → Double (JSON.hs:76-101): integral id surfaces as double
    assert(types("id") == DoubleType && types("x") == DoubleType)
    assert(types("s") == StringType && types("b") == BooleanType)
    assert(df.count() == 2)
    assert(df.filter(col("x").isNull).count() == 1)
    // spark-native typing when the reference cast is off
    val raw = Json.readJSON(spark, p.toString, numbersAsDouble = false)
    assert(raw.schema("id").dataType == LongType)
  }

  test("JSONL round trip preserves values") {
    val dir = Files.createTempDirectory("graft_jsonl").resolve("out").toString
    val src = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "s", "v")
    Json.writeJSONL(src, dir)
    val back = Json.readJSONL(spark, dir)
    assert(back.select("id", "s", "v").orderBy("id").collect().toSeq ==
      src.orderBy("id").collect().toSeq)
  }

  test("ORC round trip preserves values, types, and nulls") {
    val dir = Files.createTempDirectory("graft_orc").resolve("out").toString
    val src = Seq(
      (1L, Some("a"), Some(1.5), Some(java.sql.Date.valueOf("2024-01-31"))),
      (2L, None, Some(-2.25), None),
      (3L, Some("c"), None, Some(java.sql.Date.valueOf("1999-12-31"))))
      .toDF("id", "s", "v", "d")
    graft.sources.Orc.writeOrc(src, dir)
    val back = graft.sources.Orc.readOrc(spark, dir)
    // ORC keeps the exact Spark types (nullability always relaxes on read)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq ==
      src.orderBy("id").collect().toSeq)
    // predicate pushdown reaches the ORC scan (same posture as parquet)
    val plan = back.filter(col("id") === 2L).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"))
  }

  test("JDBC round trip through embedded Derby") {
    val url = s"jdbc:derby:memory:graftdb;create=true"
    val src = Seq((1L, "x", 10.5), (2L, "y", 20.25), (3L, "z", -1.0))
      .toDF("id", "name", "v")
    Jdbc.toPersistent(src, url, "t1")
    val back = Jdbc.fromPersistent(spark, url, "t1")
    assert(back.columns.map(_.toLowerCase).toSet == Set("id", "name", "v"))
    assert(back.orderBy("id").select("id", "name", "v").collect().toSeq ==
      src.orderBy("id").collect().toSeq)
    // append mode + partitioned parallel read
    Jdbc.toPersistent(src.withColumn("id", col("id") + 3), url, "t1",
      SaveMode.Append)
    val part = Jdbc.fromPersistentPartitioned(spark, url, "t1",
      "id", 1L, 7L, 3)
    assert(part.rdd.getNumPartitions == 3)
    assert(part.count() == 6)
  }
}
