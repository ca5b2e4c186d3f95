package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, SourceQueries}
import graft.multimodal.Multimodal

/** Round-12 batch-7 operators: staging type inference, composite-key
  * discovery, bucket-pruned lookup, partition-evolution plan, OLS
  * trend, aspect-ratio resolution bucketing.
  */
class Widening12dSpec extends AnyFunSuite {
  import SparkTestSession._

  test("type infer: every column classified to its narrowest type, int ⊂ num") {
    val rows = SourceQueries.ingestTypeInfer(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toMap
    val n = Tables.orders(spark, sf).count()
    assert(rows.size == 5)
    rows.foreach { case (c, (nv, ni, nn, nd, _)) =>
      assert(nv == n, s"$c scanned $nv of $n values — inference must be exhaustive")
      assert(ni <= nn, s"$c: integers are a subset of numerics")
      assert(nd <= nv && ni >= 0)
    }
    // the planted layout: keys integer, price decimal-not-integer,
    // date date-only, priority ('1-URGENT') leading-digit VARCHAR
    assert(rows("o_orderkey")._5 == "BIGINT")
    assert(rows("o_custkey")._5 == "BIGINT")
    assert(rows("o_totalprice")._5 == "DOUBLE" && rows("o_totalprice")._2 == 0,
      "2dp-rendered decimals must never pass the integer regex")
    assert(rows("o_orderdate")._5 == "DATE" && rows("o_orderdate")._4 == n)
    assert(rows("o_orderpriority")._5 == "VARCHAR" && rows("o_orderpriority")._3 == 0,
      "'1-URGENT' has a leading digit but must not classify numeric")
    Caches.clearAll()
  }

  test("composite key: distinctness monotone in added columns, only the triple is a key") {
    val rows = SourceQueries.ingestCompositeKey(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val n = Tables.lineitem(spark, sf).count()
    assert(rows.size == 4)
    rows.foreach { case (c, (arity, nRows, nd, dup, dupBp, isKey)) =>
      assert(nRows == n, s"$c counted against $nRows of $n rows")
      assert(dup == nRows - nd && dupBp == dup * 10000 / nRows,
        s"$c dup arithmetic must re-derive")
      assert(isKey == (if (nd == nRows) 1 else 0))
      assert(arity == c.split(",").length.toLong)
    }
    // adding a column can only refine groups (distinctness monotone)
    assert(rows("l_orderkey")._3 <= rows("l_orderkey,l_linenumber")._3)
    assert(rows("l_orderkey")._3 <= rows("l_orderkey,l_partkey")._3)
    assert(rows("l_orderkey,l_partkey")._3 <= rows("l_orderkey,l_partkey,l_suppkey")._3)
    // the corpus hazard this operator exists for: the pair reaches
    // >99% distinct (a sampled profiler would call it unique) but
    // only the triple is a real key
    assert(rows("l_orderkey,l_partkey")._6 == 0 &&
      rows("l_orderkey,l_partkey")._5 < 100,
      "the near-key pair must profile as >99% distinct yet NOT a key")
    // the triple strictly dominates the pair at every corpus size
    // (exactly unique from sf0.01 up — pinned by the oracle gate, not
    // here, because sf0.001 carries a handful of generator collisions)
    assert(rows("l_orderkey,l_partkey,l_suppkey")._4 <= rows("l_orderkey,l_partkey")._4,
      "adding l_suppkey can only remove duplicates")
    Caches.clearAll()
  }

  test("bucket pruning: scan opens only the matching buckets, rows match parquet") {
    val df = SourceQueries.loadBucketPruning(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"bucketed scan must report bucket pruning; plan:\n$plan")
    assert(m.get.group(1).toInt <= 3,
      "three point keys can touch at most three of eight buckets")
    // the data gate: bucket routing must not lose or misfile rows
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Tables.orders(spark, sf)
      .filter(col("o_custkey").isin(7L, 77L, 777L))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).cast("long").as("tc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, "bucketed read diverges from the source parquet")
    Caches.clearAll()
  }

  test("partition evolution: plan covers every row, fan-out bounded by statuses") {
    val rows = SourceQueries.loadPartitionEvolution(spark, sf).collect()
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n, "every order lands in exactly one old partition")
    val nStatuses = Tables.orders(spark, sf).select("o_orderstatus").distinct().count()
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= nStatuses,
        s"partition ${r.getLong(0)} fan-out must be within the status domain")
      assert(r.getLong(3) == r.getLong(1) * 96, "modeled rewrite bytes")
      assert(r.getLong(4) == (if (r.getLong(2) > 1) 1L else 0L))
    }
    Caches.clearAll()
  }

  test("ols trend: slope matches an overflow-free BigInt recompute per priority") {
    val got = Analytics.qOlsTrend(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // driver-side daily series (exactly the operator's unit chain)
    val daily = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000 AS dn",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 100000 AS k")
      .groupBy("o_orderpriority", "dn").agg(sum("k").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d0 = daily.map(_._2).min
    daily.groupBy(_._1).foreach { case (p, rs) =>
      val n = BigInt(rs.length)
      val sx = rs.map(r => BigInt(r._2 - d0)).sum
      val sy = rs.map(r => BigInt(r._3)).sum
      val sxy = rs.map(r => BigInt(r._2 - d0) * BigInt(r._3)).sum
      val sxx = rs.map(r => BigInt(r._2 - d0) * BigInt(r._2 - d0)).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      // BigInt / truncates toward zero — the same rounding the
      // operator's split-division reproduces inside Int64
      val slope = (num * 1000000) / den
      assert(got(p)._1 == rs.length.toLong && got(p)._2 == sy.toLong)
      assert(BigInt(got(p)._3) == slope,
        s"$p: split-division slope ${got(p)._3} != BigInt $slope")
    }
    Caches.clearAll()
  }

  test("resolution buckets: cover the corpus, dims follow the ladder, spans nest") {
    val ladder = Map(750L -> (768L, 1024L), 875L -> (896L, 1024L),
      1000L -> (1024L, 1024L), 1143L -> (1024L, 896L), 1333L -> (1024L, 768L))
    val rows = Multimodal.resolutionBucket(spark, sf).collect()
    assert(rows.map(_.getLong(3)).sum == Tables.documents(spark, sf).count())
    val rungs = ladder.keys.toSeq.sorted
    rows.foreach { r =>
      val (ar, tw, th) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(ladder(ar) == ((tw, th)), s"bucket $ar carries wrong target dims")
      // nearest-rung property with smaller-rung ties: every observed
      // AR in the bucket is at least as close to ITS rung as to any
      // other (strictly closer than larger rungs)
      Seq(r.getLong(4), r.getLong(5)).foreach { obs =>
        rungs.filterNot(_ == ar).foreach { other =>
          val (dSelf, dOther) = ((obs - ar).abs, (obs - other).abs)
          assert(dSelf < dOther || (dSelf == dOther && ar < other),
            s"ar=$obs in bucket $ar is closer to rung $other")
        }
      }
    }
    Caches.clearAll()
  }
}
