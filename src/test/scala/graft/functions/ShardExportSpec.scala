package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, tokensOf: Long => Int) =
    (0L until n.toLong).map(i => (i, Seq.fill(tokensOf(i))("w").mkString(" ")))
      .toDF("doc_id", "text")

  /** Brute-force reference: bucket by xxhash64, pack in (md5, id) order. */
  private def referenceAssign(df: org.apache.spark.sql.DataFrame,
      buckets: Int, budget: Long): Map[Long, (Long, Long)] = {
    val rows = df.select(col("doc_id"),
        pmod(xxhash64(col("doc_id").cast("string")), lit(buckets.toLong)),
        md5(col("doc_id").cast("string")),
        coalesce(TextFunctions.tokenCount(col("text")).cast("long"), lit(0L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    rows.groupBy(_._2).toSeq.flatMap { case (bucket, rs) =>
      var cum = 0L
      rs.sortBy(r => (r._3, r._1)).toSeq.map { case (id, _, _, t) =>
        val seq = cum / budget
        cum += t
        id -> (bucket, seq)
      }
    }.toMap
  }

  test("shardAssign: matches the brute-force greedy packing, budget overshoot <= one doc") {
    val df = docs(200, i => (i % 17 + 1).toInt)
    val got = ShardExport.shardAssign(df, "doc_id", "text", buckets = 4, budgetTokens = 50L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("shard_seq"))).toMap
    assert(got == referenceAssign(df, 4, 50L))
    // budget contract: a doc STARTS in a shard only while the running
    // total is under budget, so cum_before within a shard is < budget
    val over = ShardExport.shardAssign(df, "doc_id", "text", 4, 50L)
      .filter(expr("cum_before - (shard_seq * 50) >= 50")).count()
    assert(over == 0L)
  }

  test("shardAssign: deterministic under repartitioning; blank/NULL text counts zero") {
    val base = docs(100, i => (i % 7 + 1).toInt)
    val messy = Seq((200L, null: String), (201L, "   \t\n "), (202L, "one two")).toDF("doc_id", "text")
    val df = base.unionByName(messy)
    val a = ShardExport.shardAssign(df, "doc_id", "text", 4, 30L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val b = ShardExport.shardAssign(df.repartition(13, col("text")), "doc_id", "text", 4, 30L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(a == b, "assignment must be a pure function of the data")
    val zeroTok = ShardExport.shardAssign(df, "doc_id", "text", 4, 30L)
      .filter(col("doc_id") >= 200L && col("doc_id") <= 201L)
      .select("n_tokens").collect().map(_.getLong(0)).toSeq
    assert(zeroTok == Seq(0L, 0L) || zeroTok == Seq(0L, 0L).reverse)
  }

  test("packTokenStream: spans tile every window exactly; doc reassembly is gapless") {
    val df = docs(300, i => (i % 37 + 1).toInt) // doc lengths 1..37, C=16 forces spills
    val spans = ShardExport.packTokenStream(df, "doc_id", "text",
      buckets = 4, windowTokens = 16L).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("window_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_len"), r.getAs[Long]("doc_from")))

    // 1. within a (bucket, window): spans tile [0, C) contiguously with no
    //    overlap; every window except each bucket's LAST is exactly full
    val byWin = spans.groupBy(s => (s._1, s._2))
    val lastWin = spans.groupBy(_._1).map { case (b, ss) => b -> ss.map(_._2).max }
    byWin.foreach { case ((b, w), ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"window ($b,$w) does not start at 0")
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._4 + x._5 == y._4,
          s"gap/overlap in window ($b,$w)")
        case _ =>
      }
      val total = sorted.map(_._5).sum
      if (w < lastWin(b)) assert(total == 16L, s"window ($b,$w) not full: $total")
      else assert(total <= 16L)
    }

    // 2. per doc: spans reassemble the document gaplessly in window order
    val expectedTok = df.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spans.groupBy(_._3).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._6)
      assert(sorted.head._6 == 0L, s"doc $id does not start at offset 0")
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._6 + x._5 == y._6, s"doc $id span gap")
        case _ =>
      }
      assert(sorted.map(_._5).sum == expectedTok(id), s"doc $id token total")
      // consecutive doc spans sit in consecutive windows of one bucket
      assert(ss.map(_._1).distinct.length == 1)
      assert(sorted.map(_._2) sameElements
        (sorted.head._2 until sorted.head._2 + sorted.length))
    }

    // 3. stream totals: sum of spans == sum of tokens; zero-token docs drop
    assert(spans.map(_._5).sum == expectedTok.values.sum)
    val withEmpty = df.withColumn("text",
      when(col("doc_id") % 5 === 0, lit("")).otherwise(col("text")))
    val spans2 = ShardExport.packTokenStream(withEmpty, "doc_id", "text", 4, 16L)
    assert(spans2.filter(col("doc_id") % 5 === 0).count() == 0L)
  }

  test("manifestMerkle: root pins the corpus; an edit localizes top-down") {
    val df = docs(400, i => (i % 9 + 1).toInt)
    def tree(d: org.apache.spark.sql.DataFrame): Map[(Long, String), Long] = {
      val m = ShardExport.shardAssign(d, "doc_id", "text", buckets = 4,
        budgetTokens = 80L)
      val manifest = ShardExport.shardManifest(m, "doc_id")
      ShardExport.manifestMerkle(manifest).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    }
    val t1 = tree(df)
    // deterministic under partitioning
    assert(tree(df.repartition(13)) == t1)
    // one edited doc: its shard's leaf, that bucket's node, and the root
    // move; EVERY other node is byte-identical
    val edited = df.withColumn("text",
      when(col("doc_id") === 7L, concat(col("text"), lit(" x")))
        .otherwise(col("text")))
    val t2 = tree(edited)
    assert(t1.keySet == t2.keySet)
    val moved = t1.keySet.filter(k => t1(k) != t2(k)).toSeq.sortBy(_._1)
    // the edit adds a token: the doc's shard leaf changes, and every LATER
    // shard of that bucket may re-cut (cumsum shift) — but all changed
    // leaves sit in ONE bucket, exactly one bucket node moves, root moves
    val movedLeaves = moved.filter(_._1 == 0L)
    val movedBuckets = moved.filter(_._1 == 1L)
    val movedRoots = moved.filter(_._1 == 2L)
    assert(movedLeaves.nonEmpty)
    assert(movedLeaves.map(_._2.split("/").head).distinct.length == 1,
      s"edit must localize to one bucket, got $movedLeaves")
    assert(movedBuckets.map(_._2) == movedLeaves.map(_._2.split("/").head).distinct)
    assert(movedRoots == Seq((2L, "root")))
  }

  test("shardManifest: checksum is order-independent and shard-local") {
    val df = docs(120, i => (i % 5 + 1).toInt)
    val assigned = ShardExport.shardAssign(df, "doc_id", "text", 4, 40L)
    val m1 = ShardExport.shardManifest(assigned, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val m2 = ShardExport.shardManifest(assigned.repartition(7), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m1 == m2, "manifest must not depend on task interleaving")
    // bit_xor localization: dropping one doc changes EXACTLY its shard's
    // checksum (xor is self-inverse), leaving every other shard's intact
    val victim = assigned.orderBy("doc_id").limit(1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).head
    val m3 = ShardExport.shardManifest(assigned.filter(col("doc_id") =!= victim._1), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val changed = m1.keySet.filter(k => m3.get(k) != m1.get(k))
    assert(changed == Set((victim._2, victim._3)), s"only the victim's shard may change: $changed")
  }

  test("manifestDiff: statuses match a brute-force manifest compare; cascade stays in the edited buckets") {
    val v1 = docs(150, i => (i % 9 + 1).toInt)
    // v2: drop doc 30, grow doc 77 by three tokens
    val v2 = v1.filter(col("doc_id") =!= 30L)
      .withColumn("text",
        when(col("doc_id") === 77L, concat(col("text"), lit(" x y z")))
          .otherwise(col("text")))
    def manifest(df: org.apache.spark.sql.DataFrame) =
      ShardExport.shardManifest(
        ShardExport.shardAssign(df, "doc_id", "text", 4, 40L), "doc_id")
    val m1 = manifest(v1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(4), r.getLong(2), r.getLong(3))).toMap
    val m2 = manifest(v2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(4), r.getLong(2), r.getLong(3))).toMap
    val expected =
      (m2.keySet -- m1.keySet).map(k => (k._1, k._2, "added")) ++
      (m1.keySet -- m2.keySet).map(k => (k._1, k._2, "removed")) ++
      (m1.keySet & m2.keySet).filter(k => m1(k) != m2(k))
        .map(k => (k._1, k._2, "changed"))
    val got = ShardExport.manifestDiff(manifest(v1), manifest(v2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.nonEmpty, "the edits must surface")
    // cumulative packing re-cuts only downstream of an edit, so every
    // diff row lives in one of the two edited docs' buckets
    val editedBuckets = ShardExport.shardAssign(v1, "doc_id", "text", 4, 40L)
      .filter(col("doc_id").isin(30L, 77L))
      .select("bucket").collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).subsetOf(editedBuckets),
      s"diff leaked outside buckets $editedBuckets: $got")
  }

  test("epochOrder: positions are slots of a per-bucket md5(seed:id) rank; seeds decorrelate") {
    val df = docs(300, _ => 1)
    val e1 = ShardExport.epochOrder(df, "doc_id", "e1", buckets = 8, k = 64)
      .collect().map(r => r.getLong(3) -> r.getLong(0)).toMap
    // enough docs per bucket: slots 0..63 all filled, each doc at most once
    assert(e1.keySet == (0L until 64L).toSet)
    assert(e1.values.toSet.size == 64)
    // slot arithmetic: pos mod buckets == bucket, rank = pos div buckets + 1
    val rows = ShardExport.epochOrder(df, "doc_id", "e1", 8, 64).collect()
    rows.foreach { r =>
      assert(r.getLong(3) % 8 == r.getLong(1))
      assert(r.getLong(3) / 8 + 1 == r.getLong(2))
    }
    val e2 = ShardExport.epochOrder(df, "doc_id", "e2", buckets = 8, k = 64)
      .collect().map(r => r.getLong(3) -> r.getLong(0)).toMap
    assert(e1 != e2, "different seeds must yield different orders")
    // same bucket membership either epoch (bucket is seed-independent);
    // k = buckets * n so even the most ragged bucket fits every slot
    val b1 = ShardExport.epochOrder(df, "doc_id", "e1", 8, 2400)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = ShardExport.epochOrder(df, "doc_id", "e2", 8, 2400)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1.size == 300 && b1 == b2)
  }

  test("mixRecipe: integer recipe exact to the token; partial epoch is the greedy md5 prefix") {
    val df = (0L until 60L).map { i =>
      (i, Seq.fill((i % 9 + 1).toInt)("w").mkString(" "),
        if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c")
    }.toDF("doc_id", "text", "source")
    val natTok = df.select(col("source"), TextFunctions.tokenCount(col("text")).cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("nt"), count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val weights = Map("a" -> 600L, "b" -> 300L, "c" -> 100L)
    val total = 1000L
    val out = ShardExport.mixRecipe(df, "doc_id", "text", "source", weights, total)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    weights.foreach { case (d, w) =>
      val (nt, nd) = natTok(d)
      val desired = total * w / 1000L
      val full = desired / nt
      val rem = desired % nt
      (0L until full).foreach { e =>
        assert(out((d, e)) == (nd, nt), s"full epoch $e of $d")
      }
      if (rem > 0) {
        val (pd, pt) = out((d, full))
        // greedy contract: kept while cum_before < rem, so the partial
        // epoch has >= rem tokens but overshoots by at most one doc
        assert(pt >= rem || pd == nd, s"partial of $d must cover the remainder (pt=$pt rem=$rem)")
        assert(pt - rem < 10L, s"overshoot bounded by one doc's tokens (pt=$pt rem=$rem)")
      } else assert(!out.contains((d, full)))
      // realized tokens across epochs land within one doc of desired
      val realized = out.collect { case ((`d`, _), (_, t)) => t }.sum
      assert(realized >= desired && realized - desired < 10L,
        s"$d realized=$realized desired=$desired")
    }
  }

  test("writeShards: one immutable file per shard, rows in packing order, " +
      "manifest recomputed from the written files matches shardManifest") {
    val root = java.nio.file.Files.createTempDirectory("graft_shard_write_").toString
    val df = docs(300, i => (i % 13 + 1).toInt)
    val committed = ShardExport.writeShards(df, "doc_id", "text",
      buckets = 4, budgetTokens = 60L, exportRoot = root)

    // the committed manifest must equal the pure-function manifest of the
    // same input — writeShards certifies the WRITTEN bytes, so equality
    // here proves the landed files carry exactly the assigned packing
    def six(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("bucket"), r.getAs[Long]("shard_seq"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("shard_tokens"), r.getAs[Long]("checksum"), r.getAs[Long]("first_doc"))
    val expected = ShardExport.shardManifest(
      ShardExport.shardAssign(df, "doc_id", "text", 4, 60L), "doc_id")
      .collect().map(six).toSet
    assert(committed.collect().map(six).toSet == expected)

    // exactly ONE part file per (bucket, shard_seq) directory
    val dataDir = new java.io.File(root, "data")
    val segs = dataDir.listFiles().filter(f => f.isDirectory && f.getName.startsWith("seg-"))
    assert(segs.length == 1)
    val shardDirs = for {
      pw <- segs.head.listFiles().toSeq if pw.isDirectory
      pb <- pw.listFiles().toSeq if pb.isDirectory
      ps <- pb.listFiles().toSeq if ps.isDirectory
    } yield ps
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"shard dir ${d} must hold exactly one file, got ${parts.length}")
    }
    assert(shardDirs.size == expected.size, "one directory per manifest shard")

    // within a shard file, row order IS the packing order: cum_before is
    // nondecreasing as stored (single file read in one split => file order)
    shardDirs.foreach { d =>
      val rows = spark.read.parquet(d.listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toString)
        .select("cum_before").collect().map(_.getLong(0)).toSeq
      assert(rows == rows.sorted, s"packing order violated in $d")
    }

    // verified read-back returns the corpus intact
    val back = ShardExport.readShards(spark, root, "doc_id", "text")
    assert(back.count() == 300L)
  }

  test("readEpoch: physical epoch stream == the pure-function shard-shuffled order") {
    val root = java.nio.file.Files.createTempDirectory("graft_epoch_read_").toString
    val df = docs(200, i => (i % 7 + 1).toInt)
    ShardExport.writeShards(df, "doc_id", "text", 4, 40L, root)

    val got = ShardExport.readEpoch(spark, root, "doc_id", "text", "e1")
      .select("epoch_pos", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: the same math on the pure-function relations, wave key
    // included (the written manifest carries wave = 0)
    val assigned = ShardExport.shardAssign(df, "doc_id", "text", 4, 40L)
      .withColumn("wave", lit(0L))
    val manifest = ShardExport.shardManifest(
      ShardExport.shardAssign(df, "doc_id", "text", 4, 40L), "doc_id")
      .withColumn("wave", lit(0L))
    val order = ShardExport.epochShardOrder(manifest, "e1")
      .select(col("bucket"), col("shard_seq"), col("pos_base"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"), col("shard_seq"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val expect = assigned.join(order, Seq("bucket", "shard_seq"))
      .withColumn("pos", col("pos_base") + row_number().over(w))
      .select("pos", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, "physical read must replay the deterministic epoch order")
    // the epoch stream is a permutation: positions 1..N, every doc once
    assert(got.keySet == (1L to 200L).toSet)
    assert(got.values.toSet.size == 200)
    // different seed, different shard order (same membership)
    val e2 = ShardExport.readEpoch(spark, root, "doc_id", "text", "e2")
      .select("epoch_pos", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e2 != got && e2.values.toSet == got.values.toSet)
  }

  test("publishIncremental: only diff-named files re-land; untouched bytes stable; removed gone") {
    val export1 = java.nio.file.Files.createTempDirectory("graft_pub_e1_").toString
    val export2 = java.nio.file.Files.createTempDirectory("graft_pub_e2_").toString
    val dest = java.nio.file.Files.createTempDirectory("graft_pub_dest_").toString
    val v1 = docs(240, i => (i % 7 + 1).toInt)
    // v2: drop doc 13, grow doc 40 by three tokens
    val v2 = v1.filter(col("doc_id") =!= 13L)
      .withColumn("text", when(col("doc_id") === 40L,
        concat(col("text"), lit(" x y z"))).otherwise(col("text")))
    ShardExport.writeShards(v1, "doc_id", "text", 4, 50L, export1)
    ShardExport.writeShards(v2, "doc_id", "text", 4, 50L, export2)

    // initial publish: everything is "added"
    val first = ShardExport.publishIncremental(spark, export1, dest, "doc_id", "text")
      .collect()
    assert(first.nonEmpty && first.forall(_.getAs[String]("status") == "added"))
    val filesAfter1 = new java.io.File(dest, "shards").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap

    // published corpus == v1 (read back every shard file)
    val pub1 = spark.read.parquet(dest + "/shards")
    assert(pub1.count() == 240L)

    Thread.sleep(1100) // mtime resolution guard for the stability check
    val second = ShardExport.publishIncremental(spark, export2, dest, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("wave"), r.getAs[Long]("bucket"),
        r.getAs[Long]("shard_seq"), r.getAs[String]("status"))).toSet

    // the diff must equal the pure manifest diff of the two exports
    val m1 = ShardExport.shardManifests(spark, export1)
    val m2 = ShardExport.shardManifests(spark, export2)
    val expect = ShardExport.manifestDiff(
        m1.drop("wave", "content_checksum"), m2.drop("wave", "content_checksum"))
      .collect().map(r => (0L, r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(second == expect, s"got $second\nexpected $expect")

    // untouched shard files were NOT rewritten (same mtime); changed were
    val filesAfter2 = new java.io.File(dest, "shards").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    val touched = second.collect { case (w, b, s, st) if st != "removed" =>
      s"w$w-b$b-s$s.parquet" }
    val removed = second.collect { case (w, b, s, "removed") =>
      s"w$w-b$b-s$s.parquet" }
    removed.foreach(fn => assert(!filesAfter2.contains(fn), s"$fn must be deleted"))
    touched.foreach(fn =>
      assert(filesAfter2(fn) != filesAfter1(fn), s"$fn must be rewritten"))
    (filesAfter1.keySet -- touched -- removed).foreach { fn =>
      assert(filesAfter2(fn) == filesAfter1(fn), s"$fn must be untouched")
    }

    // published corpus now == v2, and per-shard contents match export2's
    // verified read
    val pub2 = spark.read.parquet(dest + "/shards")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp2 = ShardExport.readShards(spark, export2, "doc_id", "text")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pub2 == exp2)
  }

  test("readEpochHead equals the epoch order's first shards and scans only them") {
    val root = java.nio.file.Files.createTempDirectory("graft_head_").toString
    val df = docs(300, i => (i % 7 + 1).toInt)
    ShardExport.writeShards(df, "doc_id", "text", 4, 60L, root)
    val full = ShardExport.readEpoch(spark, root, "doc_id", "text", "e9", verify = false)
      .filter(col("shard_rank") <= 2L)
      .select("doc_id", "shard_rank", "within_shard", "epoch_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val head = ShardExport.readEpochHead(spark, root, "doc_id", "text", "e9", nShards = 2)
    val got = head.select("doc_id", "shard_rank", "within_shard", "epoch_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == full, "head read must equal the full epoch order's first shards")
    // the scan is partition-pruned to the named shards: the plan's read
    // must carry a partition filter on the directory triple
    val plan = head.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("pw#"),
      s"head read lost directory pruning:\n$plan")
  }

  test("publishIncremental: pointer-resolved versioned manifests; previous generation retained one cycle") {
    import java.nio.file.{Files, Paths}
    val e1 = java.nio.file.Files.createTempDirectory("graft_pub_v1_").toString
    val e2 = java.nio.file.Files.createTempDirectory("graft_pub_v2_").toString
    val e3 = java.nio.file.Files.createTempDirectory("graft_pub_v3_").toString
    val dest = java.nio.file.Files.createTempDirectory("graft_pub_ptr_").toString
    val v1 = docs(120, i => (i % 5 + 1).toInt)
    ShardExport.writeShards(v1, "doc_id", "text", 2, 50L, e1)
    ShardExport.writeShards(v1.filter(col("doc_id") =!= 7L), "doc_id", "text", 2, 50L, e2)
    ShardExport.writeShards(v1.filter(col("doc_id") > 3L), "doc_id", "text", 2, 50L, e3)

    ShardExport.publishIncremental(spark, e1, dest, "doc_id", "text")
    assert(new String(Files.readAllBytes(Paths.get(dest, "_manifest.current")), "UTF-8").trim == "1")
    assert(Files.exists(Paths.get(dest, "_manifest.v1.parquet")))

    ShardExport.publishIncremental(spark, e2, dest, "doc_id", "text")
    assert(new String(Files.readAllBytes(Paths.get(dest, "_manifest.current")), "UTF-8").trim == "2")
    // previous generation retained one cycle: a reader holding v1 can
    // still open it after the flip
    assert(Files.exists(Paths.get(dest, "_manifest.v1.parquet")))
    assert(Files.exists(Paths.get(dest, "_manifest.v2.parquet")))
    // the pointer-resolved manifest equals the export's
    val pub = spark.read.parquet(dest + "/_manifest.v2.parquet")
      .select("bucket", "shard_seq", "checksum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = ShardExport.shardManifests(spark, e2)
      .select("bucket", "shard_seq", "checksum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pub == exp)

    ShardExport.publishIncremental(spark, e3, dest, "doc_id", "text")
    // generation v1 is now two cycles old — garbage-collected
    assert(!Files.exists(Paths.get(dest, "_manifest.v1.parquet")))
    assert(Files.exists(Paths.get(dest, "_manifest.v2.parquet")) &&
      Files.exists(Paths.get(dest, "_manifest.v3.parquet")))
  }

  test("writeShards: a corrupted shard file is caught by the checksum on read") {
    val root = java.nio.file.Files.createTempDirectory("graft_shard_corrupt_").toString
    val df = docs(200, i => (i % 9 + 1).toInt)
    ShardExport.writeShards(df, "doc_id", "text", 4, 50L, root)

    // corrupt ONE shard: rewrite its single part file with one document's
    // text altered (token count preserved on one variant would only be
    // caught by content_checksum; this variant changes the count too)
    val dataDir = new java.io.File(root, "data")
    val seg = dataDir.listFiles().filter(_.getName.startsWith("seg-")).head
    val victim = (for {
      pw <- seg.listFiles().toSeq if pw.isDirectory
      pb <- pw.listFiles().toSeq if pb.isDirectory
      ps <- pb.listFiles().toSeq if ps.isDirectory
      f <- ps.listFiles().toSeq if f.getName.endsWith(".parquet")
    } yield f).head
    val rows = spark.read.parquet(victim.toString)
    val tampered = rows.withColumn("text",
      when(col("doc_id") === rows.select(min("doc_id")).head.getLong(0),
        concat(col("text"), lit(" smuggled tokens"))).otherwise(col("text")))
    val tmpOut = java.nio.file.Files.createTempDirectory("graft_tamper_").toString
    tampered.coalesce(1).write.mode("overwrite").parquet(tmpOut)
    val newPart = new java.io.File(tmpOut).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(newPart.toPath, victim.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop Hadoop's local-FS CRC sidecar so the read exercises THIS
    // layer's verification, not the transport checksum (object stores
    // have no such sidecar; the manifest checksum is the end-to-end guard)
    java.nio.file.Files.deleteIfExists(
      victim.toPath.resolveSibling("." + victim.getName + ".crc"))

    val err = intercept[ShardExport.ShardIntegrityException] {
      ShardExport.readShards(spark, root, "doc_id", "text").count()
    }
    assert(err.getMessage.contains("shard verification failed"))

    // a same-token-count in-place edit slips past the packing checksum but
    // not the byte-level content checksum
    val root2 = java.nio.file.Files.createTempDirectory("graft_shard_corrupt2_").toString
    ShardExport.writeShards(df, "doc_id", "text", 4, 50L, root2)
    val seg2 = new java.io.File(root2, "data").listFiles()
      .filter(_.getName.startsWith("seg-")).head
    val victim2 = (for {
      pw <- seg2.listFiles().toSeq if pw.isDirectory
      pb <- pw.listFiles().toSeq if pb.isDirectory
      ps <- pb.listFiles().toSeq if ps.isDirectory
      f <- ps.listFiles().toSeq if f.getName.endsWith(".parquet")
    } yield f).head
    val rows2 = spark.read.parquet(victim2.toString)
    val sameLen = rows2.withColumn("text",
      when(col("doc_id") === rows2.select(min("doc_id")).head.getLong(0),
        regexp_replace(col("text"), "^w", "X")).otherwise(col("text")))
    val tmpOut2 = java.nio.file.Files.createTempDirectory("graft_tamper2_").toString
    sameLen.coalesce(1).write.mode("overwrite").parquet(tmpOut2)
    val newPart2 = new java.io.File(tmpOut2).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(newPart2.toPath, victim2.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.deleteIfExists(
      victim2.toPath.resolveSibling("." + victim2.getName + ".crc"))
    intercept[ShardExport.ShardIntegrityException] {
      ShardExport.readShards(spark, root2, "doc_id", "text").count()
    }
  }
}
