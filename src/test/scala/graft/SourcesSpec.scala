package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{LoadRetry, Reid}
import graft.sources.Jdbc

/** Round-4 pipeline surface: live JDBC (embedded Derby), reid output
  * shaping, and the retrying dead-letter writer. */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ordering-based JDBC read partitions a no-PK table without losing rows") {
    val url = Jdbc.derbyUrl()
    Jdbc.createTable(url, "NOPK_SPEC",
      "CREATE TABLE NOPK_SPEC (K VARCHAR(16), V INT)")
    import spark.implicits._
    val df = (1 to 97).map(i => (f"k$i%03d", i)).toDF("K", "V")
    df.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Append)
      .option("driver", Jdbc.DriverClass).jdbc(url, "NOPK_SPEC", Jdbc.connProps)
    // NULL ordering key via direct SQL: Spark's Derby dialect writes
    // StringType as CLOB, and setNull(CLOB) fails on a VARCHAR column
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "INSERT INTO NOPK_SPEC VALUES (NULL, 98)")
    finally conn.close()
    val back = Jdbc.readPartitionedByOrdering(spark, url, "NOPK_SPEC", "K", 4)
    assert(back.rdd.getNumPartitions == 4, "boundary probing must yield the declared splits")
    // NULL ordering value must be claimed by the first range, not dropped
    assert(back.count() == 98, "no row (including the NULL key) lost at a split boundary")
    assert(back.agg(sum(col("V"))).head().getLong(0) == (1 to 98).sum.toLong)
    // ranges are disjoint: no key appears twice (97 keys + the NULL)
    assert(back.select("K").distinct().count() == 98)
  }

  test("rangePredicates covers NULLs, escapes quotes, and stays disjoint") {
    val preds = Jdbc.rangePredicates("C", Seq("b", "d'Arc"))
    assert(preds.length == 3)
    // identifiers are dialect-quoted (a reserved-word or mixed-case
    // ordering column must not break the extract), values escaped
    assert(preds(0).contains("\"C\" IS NULL"))
    assert(preds(1) == "\"C\" >= 'b' AND \"C\" < 'd''Arc'")
    assert(preds(2) == "\"C\" >= 'd''Arc'")
    assert(Jdbc.rangePredicates("C", Nil).sameElements(Array("1=1")))
  }

  test("source type-name map keys on the declared source type") {
    import graft.etl.SchemaMapper._
    assert(bqTypeForSourceName("IMAGE").contains("BYTES"))
    assert(bqTypeForSourceName("uniqueidentifier").contains("STRING"))
    assert(bqTypeForSourceName("MONEY").contains("FLOAT"))
    assert(bqTypeForSourceName("DECIMAL(10,2)").contains("FLOAT"))
    assert(bqTypeForSourceName("VARCHAR () FOR BIT DATA").contains("BYTES"))
    // SQL Server TIMESTAMP is a rowversion token, not a time
    assert(bqTypeForSourceName("TIMESTAMP").contains("STRING"))
    assert(bqTypeForSourceName("GEOGRAPHY").isEmpty)
  }

  test("partitioned JDBC read returns every row with the declared parallelism") {
    val url = Jdbc.derbyUrl()
    val cust = Tables.customer(spark, sf)
    val up = cust.toDF(cust.columns.map(_.toUpperCase).toIndexedSeq: _*)
    Jdbc.createAndLoad(up, url, "CUSTOMER_SPEC",
      """CREATE TABLE CUSTOMER_SPEC (
        |  C_CUSTKEY BIGINT NOT NULL PRIMARY KEY, C_NAME VARCHAR(64),
        |  C_NATIONKEY INT, C_ACCTBAL DOUBLE, C_MKTSEGMENT VARCHAR(16))""".stripMargin)
    val bounds = cust.agg(min("c_custkey"), max("c_custkey")).head()
    val back = Jdbc.readPartitioned(spark, url, "CUSTOMER_SPEC",
      "C_CUSTKEY", bounds.getLong(0), bounds.getLong(1) + 1, 4)
    assert(back.rdd.getNumPartitions == 4, "range read must keep its split plan")
    assert(back.count() == cust.count(), "no row lost in the DB round-trip")
    // spot-check a value survives the type mapping both ways
    val one = back.filter(col("C_CUSTKEY") === bounds.getLong(0)).head()
    val ref = cust.filter(col("c_custkey") === bounds.getLong(0)).head()
    assert(one.getString(one.fieldIndex("C_NAME")) == ref.getString(ref.fieldIndex("c_name")))
    assert(one.getDouble(one.fieldIndex("C_ACCTBAL")) == ref.getDouble(ref.fieldIndex("c_acctbal")))
  }

  test("columnBounds returns the driver-side MIN/MAX for split planning") {
    val url = Jdbc.derbyUrl()
    Jdbc.createTable(url, "BOUNDS_T",
      "CREATE TABLE BOUNDS_T (ID BIGINT NOT NULL PRIMARY KEY, V INT)")
    import spark.implicits._
    val df = Seq((5L, 1), (42L, 2), (17L, 3)).toDF("ID", "V")
    df.write.mode("append")
      .option("driver", Jdbc.DriverClass).jdbc(url, "BOUNDS_T", Jdbc.connProps)
    assert(Jdbc.columnBounds(url, "BOUNDS_T", "ID") == (5L, 42L))
  }

  test("probe SQL quotes reserved-word / mixed-case identifiers end-to-end") {
    val url = Jdbc.derbyUrl()
    // "Order" / "Year" / "Desc" are reserved words AND mixed-case:
    // an unquoted probe either throws a Derby syntax error or
    // case-folds to a different identifier — either way the extract
    // breaks on a perfectly legal schema
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE \"Order\"")
      catch { case _: java.sql.SQLException => () }
      st.executeUpdate(
        "CREATE TABLE \"Order\" (\"Year\" BIGINT NOT NULL, \"Desc\" VARCHAR(8))")
      (1L to 20L).foreach(i =>
        st.executeUpdate(f"INSERT INTO \"Order\" VALUES ($i, 'd$i%02d')"))
      st.close()
    } finally conn.close()
    // driver-side MIN/MAX probe round-trips the quoted names
    assert(Jdbc.columnBounds(url, "Order", "Year") == (1L, 20L))
    // boundary probes likewise, and the derived predicates cover every
    // row exactly once when executed against the quoted schema
    val pts = Jdbc.stringSplitPoints(url, "Order", "Desc", 4)
    assert(pts.nonEmpty && pts.length <= 3)
    val preds = Jdbc.rangePredicates("Desc", pts)
    val conn2 = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn2.createStatement()
      val total = preds.map { p =>
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM \"Order\" WHERE $p")
        rs.next(); val c = rs.getLong(1); rs.close(); c
      }.sum
      st.close()
      assert(total == 20L, "range predicates must cover every row exactly once")
    } finally conn2.close()
  }

  test("primary-key discovery: declared single, declared composite, inferred fallback") {
    val url = Jdbc.derbyUrl()
    Jdbc.createTable(url, "PK_ONE",
      "CREATE TABLE PK_ONE (ID BIGINT NOT NULL PRIMARY KEY, V VARCHAR(8))")
    Jdbc.createTable(url, "PK_TWO",
      "CREATE TABLE PK_TWO (A INT NOT NULL, B INT NOT NULL, V VARCHAR(8), PRIMARY KEY (A, B))")
    Jdbc.createTable(url, "PK_NONE",
      "CREATE TABLE PK_NONE (X INT, Y INT)")
    assert(Jdbc.primaryKeys(url, "PK_ONE") == Seq("ID"))
    assert(Jdbc.primaryKeys(url, "PK_TWO") == Seq("A", "B"))
    assert(Jdbc.primaryKeys(url, "PK_NONE").isEmpty)
    val cat = Jdbc.pkCatalog(spark, url, Seq("PK_ONE", "PK_TWO", "PK_NONE"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(cat.contains(("PK_TWO", "A,B", 0L)))
    assert(cat.contains(("PK_NONE", "X,Y", 1L)), "no PK -> all-columns fallback, flagged")
  }

  test("headerMap renames mapped columns, passes unmapped through, ignores absent") {
    import spark.implicits._
    val df = Seq((1L, "a", "x")).toDF("id", "tok", "name")
    val out = Reid.headerMap(df, """{"id": "row_id", "name": "full_name", "ghost": "g"}""")
    assert(out.columns.toSeq == Seq("row_id", "tok", "full_name"))
  }

  test("groupBySignature merges equal header sets and plans batches") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((3L, "z")).toDF("k", "v")
    val c = Seq((1L, 2L, 3L)).toDF("p", "q", "r")
    val rows = Reid.groupBySignature(Seq(a, b, c), 2L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq(("k,v", 3L, 2L), ("p,q,r", 1L, 1L)))
  }

  test("pluggable sinks: warehouse layout round-trips, topic publish re-readable") {
    import graft.sources.{FileMessageSink, ParquetWarehouseSink, WarehouseSink, MessageSink}
    val base = java.nio.file.Files.createTempDirectory("graft-sinks").toString
    // the seam: operators hold the TRAIT; the local impls are defaults
    val wh: WarehouseSink = new ParquetWarehouseSink(base)
    val topic: MessageSink = new FileMessageSink(base)
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_name")
    wh.write(cust, "wh", "cust", "WRITE_TRUNCATE")
    assert(spark.read.parquet(s"$base/wh/cust").count() == cust.count())
    // WRITE_APPEND through the same trait doubles the table
    wh.write(cust, "wh", "cust")
    assert(spark.read.parquet(s"$base/wh/cust").count() == 2 * cust.count())
    val payloads = graft.operators.DlpQueries.reidPublishFormat(spark, sf)
    Reid.publish(payloads, topic, "reid-out")
    val back = spark.read.json(s"$base/reid-out")
    assert(back.count() == payloads.count())
    // payloads arrive verbatim, parseable JSON in the message column
    assert(back.columns.contains("message"))
    assert(spark.read.json(back.select("message").as[String](
      org.apache.spark.sql.Encoders.STRING)).columns.sorted
      .sameElements(Array("c_custkey", "c_mktsegment", "c_name")))
  }

  test("sink-shaped writeWithRetry loads through the warehouse trait") {
    import graft.sources.ParquetWarehouseSink
    val base = java.nio.file.Files.createTempDirectory("graft-sinkretry").toString
    val events = Tables.events(spark, sf).limit(200)
    LoadRetry.writeWithRetry(events, new ParquetWarehouseSink(base),
      "wh", "events", s"$base/dead", maxAttempts = 3)
    val loaded = spark.read.parquet(s"$base/wh/events").count()
    val dead = spark.read.parquet(s"$base/dead").count()
    assert(loaded + dead == 200)
    assert(loaded > 0 && dead > 0) // testdata carries real poison rows
  }

  test("writeWithRetry: transient failure retried to success, poison dead-lettered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-retry").toString
    val events = Tables.events(spark, sf)
    val nDead = graft.etl.Ingest.deadLetterRoute(events)
      .filter(col("status") === "dead").count()
    var calls = 0
    LoadRetry.writeWithRetry(events, s"$dir/dead", maxAttempts = 3) { ok =>
      calls += 1
      if (calls == 1) throw new RuntimeException("transient 503")
      ok.write.mode("overwrite").parquet(s"$dir/ok")
    }
    assert(calls == 2, "first attempt fails, second succeeds")
    val okRows = spark.read.parquet(s"$dir/ok").count()
    assert(okRows == events.count() - nDead)
    assert(spark.read.parquet(s"$dir/dead").count() == nDead)
  }

  test("writeWithRetry: exhausted retries dead-letter the batch, never throw") {
    val dir = java.nio.file.Files.createTempDirectory("graft-retry2").toString
    val events = Tables.events(spark, sf).limit(50)
    var calls = 0
    LoadRetry.writeWithRetry(events, s"$dir/dead", maxAttempts = 2) { _ =>
      calls += 1; throw new RuntimeException("permanent outage")
    }
    assert(calls == 2)
    val dead = spark.read.parquet(s"$dir/dead")
    assert(dead.filter(col("reason").startsWith("retry_exhausted:")).count() > 0,
      "exhausted rows must carry the terminal cause in the reason")
  }

  test("cdcApply: tombstones delete, log-only keys insert, untouched keys survive") {
    import graft.operators.SourceQueries
    val out = SourceQueries.cdcApply(spark, sf)
    val events = Tables.events(spark, sf)
      .selectExpr("(event_id % 1800) + 1 AS k", "event_id AS seq",
        "CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op")
    // final op per key, recomputed independently via a window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seq").desc)
    val lastOp = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("k", "op")
    val deleted = lastOp.filter(col("op") === "D").select("k")
    assert(deleted.count() > 0, "sanity: the log contains tombstones")
    assert(out.join(deleted, "k").count() == 0,
      "keys whose final op is a tombstone must be absent")
    // log-only inserts (k above the snapshot keyspace) surface as src='cdc'
    val maxSnap = Tables.customer(spark, sf)
      .agg(max(col("c_custkey"))).collect()(0).getLong(0)
    val inserted = out.filter(col("k") > maxSnap)
    assert(inserted.count() > 0, "sanity: log-only keys exist")
    assert(inserted.filter(col("src") =!= "cdc").count() == 0,
      "log-only keys must carry the cdc payload")
    // keys never touched by the log keep their snapshot value
    val untouched = out.join(events.select("k").distinct(), Seq("k"), "left_anti")
    assert(untouched.filter(col("src") =!= "snapshot").count() == 0,
      "untouched keys must keep the snapshot payload")
  }

  test("checksumReconcile: mismatches exactly localize the dropped keys' buckets") {
    import graft.operators.SourceQueries
    val out = SourceQueries.checksumReconcile(spark, sf)
    val expectBad = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 509 === 0)
      .selectExpr("o_orderkey % 97 AS bucket").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(expectBad.nonEmpty, "sanity: the simulated loss drops rows")
    val flagged = out.filter(col("ok") === 0)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == expectBad,
      s"flagged buckets $flagged != buckets with dropped keys $expectBad")
    // counts must localize the loss too, not just the checksum bit
    val lost = out.selectExpr("sum(n_src - n_dst) AS d").collect()(0).getLong(0)
    val dropped = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 509 === 0).count()
    assert(lost == dropped, s"count delta $lost != dropped rows $dropped")
  }
}
