package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.control.TaskParams
import graft.functions.KvString
import graft.ops.PageFunnel
import graft.sources.Jdbc
import graft.tables.Tables

/** Control plane (S8), JDBC source/sink (S4/S9), and the k=v| output
  * codec (F8). */
class ControlAndSourcesSpec extends SparkSpec {

  private lazy val derbyUrl = {
    val dir = Files.createTempDirectory("graft-derby-src").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("S1 production branch: catalog (spark.table) source matches the file branch") {
    Tables.createCatalogTables(spark, sf, "graft_cat")
    // external tables: no data copy, same files
    val fromCatalog = Tables.catalog(spark, "graft_cat.lineitem")
    val fromFiles = Tables(spark, sf, "lineitem")
    assert(fromCatalog.count() == fromFiles.count())
    assert(fromCatalog.schema == fromFiles.schema)
    // the events nanos→micros rebuild applies on BOTH branches
    val ev = Tables.catalog(spark, "graft_cat.events")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() == Tables(spark, sf, "events").count())
    // idempotent re-registration
    Tables.createCatalogTables(spark, sf, "graft_cat")
    // predicate pushdown reaches the parquet scan through the catalog
    val plan = fromCatalog.filter(col("l_orderkey") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)]"), plan)
  }

  test("S4: spark.read.jdbc dimension source round-trips city_info") {
    val conn = DriverManager.getConnection(derbyUrl)
    conn.createStatement().executeUpdate(
      "CREATE TABLE city_info (city_id BIGINT, city_name VARCHAR(64), area VARCHAR(64))")
    val ins = conn.prepareStatement("INSERT INTO city_info VALUES (?, ?, ?)")
    Seq((0L, "Beijing", "North"), (1L, "Shanghai", "East"), (2L, "Guangzhou", "South"))
      .foreach { case (id, n, a) =>
        ins.setLong(1, id); ins.setString(2, n); ins.setString(3, a)
        ins.executeUpdate()
      }
    conn.close()

    val cityInfo = Jdbc.read(spark, derbyUrl, "city_info")
    assert(cityInfo.count() == 3)
    // J7: tiny dimension broadcast-joined against a fact side.
    val clicks = spark.range(10).select(
      col("id").as("click_id"), (col("id") % 3).as("city_id"))
    val joined = clicks.join(broadcast(cityInfo), "city_id")
    assert(joined.count() == 10)
    assert(joined.filter(col("area") === "East").count() == 3)
  }

  test("S9: df.write.jdbc batch append + read-back") {
    val out = Tables(spark, sf, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("doc_count"))
    Jdbc.append(out, derbyUrl, "lang_counts")
    val back = Jdbc.read(spark, derbyUrl, "lang_counts")
    assert(back.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("S8: task_param JSON decode (1-element-array quirk) + JDBC control read") {
    val json =
      """{"minAcctbal":["100.5"],"segments":["BUILDING,MACHINERY"],
        | "eventTypes":["click,purchase"],"nations":["3,7"]}""".stripMargin
    val p = TaskParams.fromJson(spark, json)
    assert(p.double("minAcctbal").contains(100.5))
    assert(p.list("segments").contains(Seq("BUILDING", "MACHINERY")))
    val f = p.toSessionFilter
    assert(f.minAcctbal.contains(100.5) && f.maxAcctbal.isEmpty)
    assert(f.nations.contains(Seq(3, 7)))

    val conn = DriverManager.getConnection(derbyUrl)
    conn.createStatement().executeUpdate(
      "CREATE TABLE task (task_id BIGINT, task_param VARCHAR(512))")
    val ins = conn.prepareStatement("INSERT INTO task VALUES (?, ?)")
    ins.setLong(1, 42L); ins.setString(2, json); ins.executeUpdate()
    conn.close()
    assert(TaskParams.fromJdbc(spark, derbyUrl, 42L)
      .list("eventTypes").contains(Seq("click", "purchase")))
  }

  test("F8: k=v| codec encodes/decodes and funnel packs to reference shape") {
    val df = spark.range(1).select(
      KvString.encode(Seq(
        "session_count" -> lit(100), "1s_3s" -> lit(20), "4s_6s" -> lit(9)))
        .as("packed"))
    val packed = df.head().getString(0)
    assert(packed == "session_count=100|1s_3s=20|4s_6s=9")
    assert(df.select(KvString.field(col("packed"), "1s_3s")).head().getString(0) == "20")

    val funnel = PageFunnel.packed(spark,
      graft.ops.Sessionize.assignSessions(Tables(spark, sf, "events")),
      Seq("view", "click", "purchase"))
    val s = funnel.head().getString(0)
    // shape: view_click=<bp>|click_purchase=<bp>, rates in flow order
    assert(s.matches("view_click=\\d+\\|click_purchase=\\d+"), s)
  }

  test("JSONL corpus ingest: explicit schema, minted ids, corrupt-line quarantine") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part0.jsonl"),
      """{"id": 7, "text": "hello world", "lang": "en", "source": "web"}
        |{"text": "no id doc", "lang": "de"}
        |{not json at all
        |{"lang": "fr", "source": "dump"}
        |""".stripMargin)
    val out = graft.sources.DocFiles.readJsonl(spark, dir).cache()
    val good = out.filter(col("corrupt_record").isNull)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._2)
    assert(good.length == 2)
    assert(good(0) == ((7L, "hello world", "en", "web", 11L)))
    val noId = good(1)
    assert(noId._2 == "no id doc" && noId._4 == "jsonl" && noId._5 == 9L)
    // minted id is the content hash — stable across re-reads
    val again = graft.sources.DocFiles.readJsonl(spark, dir)
      .filter(col("text") === "no id doc").select("doc_id").as[Long].head()
    assert(noId._1 == again)
    // BOTH failure shapes quarantine on corrupt_record: malformed
    // JSON keeps its raw line; a valid line with no text (not a
    // document) gets the sentinel — nothing slips through with a
    // null doc_id and no flag
    val bad = out.filter(col("corrupt_record").isNotNull)
      .select("corrupt_record").as[String].collect().sorted
    assert(bad.toSeq == Seq("__missing_text__", "{not json at all"))
    // corrupt rows do NOT mint an id (xxhash64(NULL) is the constant
    // 42 — a minted one would collide with a legitimate doc_id 42)
    assert(out.filter(col("corrupt_record").isNotNull)
      .filter(col("doc_id").isNotNull).count() == 0)
    // and the quarantine is exhaustive: every row either has an id or
    // is flagged
    assert(out.filter(col("doc_id").isNull &&
      col("corrupt_record").isNull).count() == 0)
    out.unpersist()
  }

  test("text-tree ingest: one row per file, path-derived source, hash ids") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-txt").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"), "doc one body")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.txt"), "doc two\nwith a newline")
    val out = graft.sources.DocFiles.readTextTree(spark, dir)
      .select("source", "text", "n_chars")
      .as[(String, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a.txt", "doc one body", 12L),
      ("b.txt", "doc two\nwith a newline", 22L)))
  }
}
