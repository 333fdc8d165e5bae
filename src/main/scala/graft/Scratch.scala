package graft

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (q <- args) {
      if (q == "maint_probe") {
        // stage attribution for the streamed-maintainer bench rows
        // (q160 postings / q158 embedding / q164 requantize): which part
        // of the lifecycle owns the time — bootstrap commit, signed
        // batch, readback/serve
        import org.apache.spark.sql.functions._
        import graft.streaming.{EmbeddingDedupStream, PostingsStream}
        import graft.operators.{EmbeddingIndex, TextAnalysis}
        val tb = Tables(spark, dir)
        // warm the scans
        t("warmup") { tb.documents.count(); tb.embeddings.count(); () }
        locally { // q160
          val d = tb.documents.select(col("doc_id"), col("text"))
          val root = java.nio.file.Files
            .createTempDirectory("graft-p160").toString
          t("q160 batch0 bootstrap") {
            PostingsStream.applySignedBatchDelta(spark, root,
              d.filter(col("doc_id") % 10 =!= 0)
                .select(lit("I").as("op"), col("doc_id"), col("text")),
              batchId = 0L)
          }
          t("q160 batch1 mixed") {
            PostingsStream.applySignedBatchDelta(spark, root,
              d.filter(col("doc_id") % 7 === 0)
                .select(lit("D").as("op"), col("doc_id"), col("text"))
                .unionByName(d.filter(col("doc_id") % 10 === 0)
                  .select(lit("I").as("op"), col("doc_id"), col("text"))),
              batchId = 1L)
          }
          t("q160 serve") {
            PostingsStream.bm25TopKDelta(spark, root,
              TextAnalysis.Bm25Queries).collect(); ()
          }
        }
        locally { // q158 + q164 tail
          val e = tb.embeddings
          val isBatch = col("vec_id") % 10 === 0
          val corpus = e.filter(!isBatch)
          var cent: org.apache.spark.sql.DataFrame = null
          t("q158 seedCentroids") {
            cent = EmbeddingIndex.seedCentroids(corpus, "embedding",
              "vec_id", nCells = 16)
          }
          val root = java.nio.file.Files
            .createTempDirectory("graft-p158").toString
          t("q158 stamp") {
            EmbeddingIndex.ensureIndexStamp(spark, root, cent,
              EmbeddingIndex.FlatRouter, stateExists = false)
          }
          t("q158 bootstrap commit") {
            graft.util.DeltaView(spark, root, Seq("vec_id"),
                compactEvery = 1, basePartitionCols = Seq("cell"))
              .applyBatch(0L) { _ =>
                (EmbeddingIndex.assignCells(corpus, cent, "embedding",
                    "vec_id")
                  .select(col("vec_id").cast("long"),
                    col("cell").cast("long"),
                    col("v").cast("array<double>")),
                 e.limit(0).select(col("vec_id")))
              }: Unit
          }
          t("q158 signed I-batch") {
            EmbeddingDedupStream.applyBatchDelta(spark, root, cent,
              e.filter(isBatch).select(lit("I").as("op"), col("vec_id"),
                col("embedding")), batchId = 1L)
          }
          t("q158 readback") {
            EmbeddingDedupStream.readIndexDelta(spark, root)
              .select(col("vec_id"), col("cell")).orderBy(col("vec_id"))
              .collect(); ()
          }
          var newCent: org.apache.spark.sql.DataFrame = null
          t("q164 re-seed 32") {
            newCent = EmbeddingIndex.seedCentroids(
              EmbeddingDedupStream.readIndexDelta(spark, root), "v",
              "vec_id", nCells = 32)
          }
          t("q164 requantize") {
            EmbeddingDedupStream.requantizeDelta(spark, root, newCent,
              batchId = 2L)
          }
          t("q164 readback") {
            EmbeddingDedupStream.readIndexDelta(spark, root)
              .select(col("vec_id"), col("cell")).orderBy(col("vec_id"))
              .collect(); ()
          }
        }
      }
      else if (q == "pr_probe") prProbe(spark, dir, t)
      else if (q == "repl_probe") replProbe(spark, dir, t)
      else if (q == "setsim_capped_probe") {
        val tb = Tables(spark, dir)
        val cap = operators.Dedup.dfCapFor(tb.documents.count())
        t(s"setsim capped (df<=$cap)") {
          operators.Dedup.setSimJoinPrefix(tb.documents, "text", "doc_id",
            n = 3, threshold = 0.5, maxDf = Some(cap)).count(); ()
        }
      }
      else if (q == "simhash_cand_probe") {
        // print simhashPairs' band-bucket candidate estimate at this dir
        // (calibration for maxCandEstimate) — bound 0 forces the refusal,
        // whose message carries the computed estimate
        val tb = Tables(spark, dir)
        try {
          operators.Dedup.simhashPairs(tb.documents, "text", "doc_id",
            maxCandEstimate = 0L).count(): Unit
          println("[scratch] simhash candidates: 0")
        } catch { case e: graft.util.ContractRefusal =>
          println(s"[scratch] $dir: ${e.getMessage.takeWhile(_ != '(')}") }
      }
      else if (q == "setsim_cand_probe") {
        // print the guard's candidate estimate at this dir (calibration
        // for setSimJoinPrefix.maxCandEstimate): bound 0 forces the
        // refusal, whose message carries the computed estimate
        val tb = Tables(spark, dir)
        try {
          operators.Dedup.setSimJoinPrefix(tb.documents, "text", "doc_id",
            maxCandEstimate = 0L).count(): Unit
          println("[scratch] setsim candidates: 0 (empty prefix frame?)")
        } catch { case e: graft.util.ContractRefusal =>
          println(s"[scratch] $dir: ${e.getMessage.takeWhile(_ != ';')}") }
      }
      else if (q == "grouped_pairs_probe") {
        // grouped vs per-doc minhashLshPairs on a DUPLICATE-HEAVY corpus:
        // every doc replicated into an 8-copy class (the shape the old
        // scale generator planted by accident and boilerplate-heavy web
        // corpora have for real). df cap scaled so class shingles survive.
        import org.apache.spark.sql.functions._
        val docs = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
        val base = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
        for (c <- Seq(8, 30, 100)) {
          val dup = (0 until c).map(i =>
            docs.select((col("doc_id") + lit(i.toLong * base)).as("doc_id"),
              col("text")))
            .reduce(_ unionByName _).localCheckpoint()
          val cap = operators.Dedup.dfCapFor(dup.count())
          t(s"grouped ($c-copy classes)") {
            operators.Dedup.minhashLshPairs(dup, "text", "doc_id",
              maxShingleDf = cap).count(); ()
          }
          spark.catalog.clearCache()
          t(s"per-doc ($c-copy classes)") {
            operators.Dedup.minhashLshPairsUngrouped(dup, "text", "doc_id",
              maxShingleDf = cap).count(); ()
          }
          spark.catalog.clearCache()
        }
      }
      else if (q == "ivf_stream_probe") {
        import org.apache.spark.sql.functions._
        import graft.operators.EmbeddingIndex
        import graft.streaming.EmbeddingDedupStream
        val scale = math.max(1, (Tables(spark, dir).embeddings.count() / 6000).toInt)
        val e = Tables(spark, dir).embeddings
        val isBatch = col("vec_id") % 10 === 1 && col("vec_id") < 2000
        val corpus = e.filter(!isBatch)
        val cent = EmbeddingIndex.seedCentroids(corpus, "embedding",
          "vec_id", nCells = 16 * scale).cache()
        val root = java.nio.file.Files.createTempDirectory("graft-ivfsx").toString
        t("bootstrap commit") {
          EmbeddingDedupStream.applyBatchDelta(spark, root, cent,
            corpus.select(lit("I").as("op"), col("vec_id"), col("embedding")),
            0L, compactEvery = 1)
        }
        val batch = e.filter(isBatch).select("vec_id", "embedding")
        t("probeDelta cold") {
          EmbeddingDedupStream.probeDelta(spark, root, cent, batch).count(); ()
        }
        t("probeDelta warm") {
          EmbeddingDedupStream.probeDelta(spark, root, cent, batch).count(); ()
        }
        // stage split
        val q2 = batch.select(col("vec_id").cast("long").as("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        t("routing collect") {
          EmbeddingIndex.probeRouting(cent, q2, "v", "vec_id", 2)
            .select(col("cell").cast("long")).distinct().collect(); ()
        }
        var idx: org.apache.spark.sql.DataFrame = null
        t("dv.read() build") {
          idx = graft.util.DeltaView(spark, root, Seq("vec_id"),
            compactEvery = 8, basePartitionCols = Seq("cell")).read().get
        }
        val cells = EmbeddingIndex.probeRouting(cent, q2, "v", "vec_id", 2)
          .select(col("cell").cast("long")).distinct()
          .collect().map(_.getLong(0)).toIndexedSeq
        t("pruned count") {
          idx.filter(col("cell").isin(cells: _*)).count(); ()
        }
        t("probeDedup on pruned") {
          EmbeddingIndex.probeDedup(
            idx.filter(col("cell").isin(cells: _*))
              .select(col("vec_id").cast("long"), col("cell").cast("long"), col("v")),
            cent, q2, "v", "vec_id").count(); ()
        }
        // exact inline reproduction of probeDelta, then variants
        t("inline probeDelta") {
          val idxN = graft.util.DeltaView(spark, root, Seq("vec_id"),
            compactEvery = 8, basePartitionCols = Seq("cell")).read().get
            .select(col("vec_id").cast("long"), col("cell").cast("long"), col("v"))
          val cs = EmbeddingIndex.probeRouting(cent, q2, "v", "vec_id", 2)
            .select(col("cell").cast("long")).distinct()
            .collect().map(_.getLong(0)).toIndexedSeq
          EmbeddingIndex.probeDedup(idxN.filter(col("cell").isin(cs: _*)),
            cent, q2, "v", "vec_id").count(); ()
        }
        t("inline, filter before cast") {
          val idxN = graft.util.DeltaView(spark, root, Seq("vec_id"),
            compactEvery = 8, basePartitionCols = Seq("cell")).read().get
          val cs = EmbeddingIndex.probeRouting(cent, q2, "v", "vec_id", 2)
            .select(col("cell").cast("long")).distinct()
            .collect().map(_.getLong(0)).toIndexedSeq
          EmbeddingIndex.probeDedup(
            idxN.filter(col("cell").isin(cs: _*))
              .select(col("vec_id").cast("long"), col("cell").cast("long"), col("v")),
            cent, q2, "v", "vec_id").count(); ()
        }
        val df = EmbeddingDedupStream.probeDelta(spark, root, cent, batch)
        df.count()
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        def deep(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
          import org.apache.spark.sql.execution.adaptive.QueryStageExec
          import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
          val extra = p match {
            case qs: QueryStageExec => Seq(qs.plan)
            case r: ReusedExchangeExec => Seq(r.child)
            case _ => Seq.empty
          }
          p +: (p.children ++ extra).flatMap(deep)
        }
        deep(plan).collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            println(s"[scratch] scan partFilters=${f.partitionFilters.size} " +
              f.partitionFilters.mkString(",").take(120))
        }
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
      else if (q == "idx_build_k_probe") {
        // flat (n·k) vs hier (n·2√k) index-BUILD cost at FIXED n, growing
        // k — the axis the cells-∝-n layout ties to corpus size (k =
        // n / cellSize), so the k-crossover measured here maps directly to
        // the corpus size n* = cellSize · k* where the hier build starts
        // winning. The BENCH_sf4_build rows pinned the growth terms (flat
        // leg rising, hier flat) but their corpus tops out before the
        // crossover; this probe grows k past it at constant n.
        import org.apache.spark.sql.functions._
        import graft.operators.EmbeddingIndex
        val e0 = Tables(spark, dir).embeddings
        val reps = sys.env.getOrElse("SPARK_GRAFT_BUILD_REPS", "4").toInt
        val base = e0.agg(max(col("vec_id"))).head().getLong(0) + 1
        val e = (0 until reps).map(i =>
            e0.select((col("vec_id") + lit(i.toLong * base)).as("vec_id"),
              col("embedding")))
          .reduce(_ unionByName _).localCheckpoint()
        val n = e.count()
        val ks = sys.env.getOrElse("SPARK_GRAFT_BUILD_KS", "64,256,1024,4096")
          .split(",").map(_.trim.toInt).toSeq
        for (k <- ks; run <- Seq("a", "b")) {
          val cent = EmbeddingIndex.seedCentroids(e, "embedding", "vec_id", k)
            .localCheckpoint()
          // consume sum(cell), not count(): count() column-prunes the
          // max(struct(…)) argmax — the entire cosine scoring — out of
          // the plan (the find BENCH_k_build.md documents)
          t(s"flat n=$n k=$k ($run)") {
            EmbeddingIndex.assignCells(e, cent, "embedding", "vec_id")
              .agg(sum(col("cell"))).head(); ()
          }
          t(s"hier n=$n k=$k ($run)") {
            EmbeddingIndex.assignCellsHier(e, cent, "embedding", "vec_id")
              .agg(sum(col("cell"))).head(); ()
          }
        }
      }
      else if (q == "idx_build_hier_split") {
        // stage attribution for assignCellsHier at large k: where does the
        // two-level build's constant live — childOf (k·√k model join +
        // k-row broadcast), stage-1 coarse routing (n·√k), or stage-2
        // child argmax (n·(k/√k) fan-out)?
        import org.apache.spark.sql.functions._
        import graft.operators.EmbeddingIndex
        import graft.functions.VectorFunctions._
        val e0 = Tables(spark, dir).embeddings
        val reps = sys.env.getOrElse("SPARK_GRAFT_BUILD_REPS", "256").toInt
        val base = e0.agg(max(col("vec_id"))).head().getLong(0) + 1
        val e = (0 until reps).map(i =>
            e0.select((col("vec_id") + lit(i.toLong * base)).as("vec_id"),
              col("embedding")))
          .reduce(_ unionByName _).localCheckpoint()
        val k = sys.env.getOrElse("SPARK_GRAFT_BUILD_K", "65536").toInt
        val cent = EmbeddingIndex.seedCentroids(e, "embedding", "vec_id", k)
          .localCheckpoint()
        val nCoarse = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
        val coarse = cent.orderBy(col("cid")).limit(nCoarse)
          .select(col("cid").as("gid"), col("cv").as("gv")).localCheckpoint()
        for (run <- Seq("a", "b")) {
          var childOf: org.apache.spark.sql.DataFrame = null
          t(s"childOf k=$k ($run)") {
            childOf = cent.join(broadcast(coarse))
              .groupBy(col("cid"))
              .agg(max(struct(
                cosineFast(col("cv"), col("gv")).as("cos"),
                (-col("gid")).as("ngid"),
                col("cv").as("cv"))).as("m"))
              .select(col("cid"), (-col("m.ngid")).as("gid"),
                col("m.cv").as("cv")).localCheckpoint()
          }
          var vg: org.apache.spark.sql.DataFrame = null
          t(s"stage1 vec->coarse ($run)") {
            vg = e.select(col("vec_id"), col("embedding").as("v"))
              .join(broadcast(coarse))
              .groupBy(col("vec_id"))
              .agg(max(struct(
                cosineFast(col("v"), col("gv")).as("cos"),
                (-col("gid")).as("ngid"),
                col("v").as("v"))).as("m"))
              .select(col("vec_id"), (-col("m.ngid")).as("gid"),
                col("m.v").as("v")).localCheckpoint()
          }
          t(s"stage2 child argmax ($run)") {
            vg.join(broadcast(childOf), "gid")
              .groupBy(col("vec_id"))
              .agg(max(struct(
                cosineFast(col("v"), col("cv")).as("cos"),
                (-col("cid")).as("ncid"),
                col("v").as("v"))).as("m"))
              .select(col("vec_id"), (-col("m.ncid")).as("cell"))
              .agg(sum(col("cell"))).head(); () // sum, not count: see above
          }
        }
      }
      else if (q == "epoch_cost_probe") {
        // interleaved A/B: per-cycle cost of a partitioned incremental
        // with db epochs OFF vs ON, alternating so JVM/debris ordering
        // can't masquerade as feature cost
        import org.apache.spark.sql.functions.{col, lit, pmod}
        import graft.repl._
        val li = Tables(spark, dir).lineitem
        val nPart = 16 * math.max(1, (li.count() / 600000L).toInt)
        def mk(tag: String, epochs: Boolean) = {
          val root = java.nio.file.Files.createTempDirectory(s"graft-ec$tag").toString
          val src = DbCatalog(spark, s"$root/src")
          val tgt = DbCatalog(spark, s"$root/tgt", epochMode = epochs)
          src.createDb("db")
          src.writeTablePartitioned("db", "lineitem",
            li.withColumn("l_pbucket", pmod(col("l_orderkey"), lit(nPart))), "l_pbucket")
          val job = ReplicationJob(spark, src, tgt, s"$root/dumps",
            ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 100))
          assert(job.run("db").verify == "SUCCESS")
          (root, src, job)
        }
        val (rootA, srcA, jobA) = mk("off", epochs = false)
        val (rootB, srcB, jobB) = mk("on", epochs = true)
        for (round <- 1 to 4) {
          def cycle(src: DbCatalog, job: ReplicationJob): Double = {
            src.appendEvents("db", (1 to 1000).map { i =>
              val k = (round * 1000000 + i) * nPart
              DbCatalog.Event("lineitem", DbCatalog.OpUpsert, k.toString,
                s"""{"l_orderkey":$k,"l_linenumber":1,"l_quantity":$i,"l_pbucket":0}""")
            })
            val t0 = System.nanoTime()
            assert(job.run("db").verify == "SUCCESS")
            (System.nanoTime() - t0) / 1e9
          }
          val a = cycle(srcA, jobA); val b = cycle(srcB, jobB)
          println(f"[scratch] round $round epochs-off $a%.2f s  epochs-on $b%.2f s")
        }
        Seq(rootA, rootB).foreach(r =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r)))
      }
      else if (q == "q78_stage_probe") {
        // piecewise q78: which stage moved (r10 bench 7.3 s vs r9 4.1 s)
        import org.apache.spark.sql.functions._
        import operators.{Dedup, Pipeline, TextAnalysis}
        val docs = Tables(spark, dir).documents
        val isEval = col("doc_id") % 11 === 0
        val train = docs.filter(!isEval)
        val eligible = train.filter(
          TextAnalysis.langGuessExpr(col("text")) === "en" &&
          TextAnalysis.qualityKeepExpr(col("text")))
        val kept = Dedup.exact(eligible, col("text"), col("doc_id"))
          .select(col("keep_id").as("doc_id"))
        val e2 = eligible.join(kept, Seq("doc_id"), "left_semi")
          .localCheckpoint()
        t("stages 0-3 (to e2)")(e2.count())
        for (_ <- 1 to 2) {
          t("stage4 pairs grouped")(
            Dedup.minhashLshPairs(e2, "text", "doc_id").count())
          spark.catalog.clearCache()
          t("stage4 pairs per-doc")(
            Dedup.minhashLshPairsUngrouped(e2, "text", "doc_id").count())
          spark.catalog.clearCache()
        }
        t("stage4 cc grouped") {
          Pipeline.connectedComponents(
            Dedup.minhashLshPairs(e2, "text", "doc_id")).count(); ()
        }
        spark.catalog.clearCache()
        t("stage4 cc per-doc") {
          Pipeline.connectedComponents(
            Dedup.minhashLshPairsUngrouped(e2, "text", "doc_id")).count(); ()
        }
        spark.catalog.clearCache()
        t("stage5 contamination") {
          Pipeline.contamination(
            docs.filter(isEval).unionByName(e2), "text", "doc_id",
            isEval = col("doc_id") % 11 === 0, n = 5, threshold = 0.5).count(); ()
        }
      }
      else {
        t(s"$q run1")(SparkEntry.queries(q)(spark, dir).count())
        t(s"$q run2")(SparkEntry.queries(q)(spark, dir).count())
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  /** Piecewise timing of the partitioned incremental-merge cycle (r8 scale
    * study follow-up): noop cycle = control-plane floor, full cycle, and
    * the dead-key locate scan in isolation — the one O(table) term left in
    * the partition-scoped path.
    */
  private def replProbe(spark: org.apache.spark.sql.SparkSession, dir: String,
                        t: String => (=> Unit) => Unit): Unit = {
    import org.apache.spark.sql.functions._
    import graft.repl._
    val root = java.nio.file.Files.createTempDirectory("graft-replprobe").toString
    val li = Tables(spark, dir).lineitem
    val nPart = 16 * math.max(1, (li.count() / 600000L).toInt)
    val src = DbCatalog(spark, s"$root/src")
    val tgt = DbCatalog(spark, s"$root/tgt")
    src.createDb("pdb")
    t("seed partitioned write") {
      src.writeTablePartitioned("pdb", "lineitem",
        li.withColumn("l_pbucket", pmod(col("l_orderkey"), lit(nPart))), "l_pbucket")
    }
    val job = ReplicationJob(spark, src, tgt, s"$root/dumps",
      ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 100))
    t("bootstrap")(assert(job.run("pdb").verify == "SUCCESS"))
    t("noop incremental cycle")(assert(job.run("pdb").verify == "NOOP"))
    t("noop incremental cycle 2")(assert(job.run("pdb").verify == "NOOP"))
    def events(round: Int) = (1 to 1000).map { i =>
      val k = (round * 1000000 + i) * nPart
      DbCatalog.Event("lineitem", DbCatalog.OpUpsert, k.toString,
        s"""{"l_orderkey":$k,"l_linenumber":1,"l_quantity":$i,"l_pbucket":0}""")
    }
    src.appendEvents("pdb", events(1))
    t("1000txn incremental cycle")(assert(job.run("pdb").verify == "SUCCESS"))
    // The locate scan in isolation, on the TARGET copy (same layout).
    val cur = tgt.readTable("pdb", "lineitem")
    val keys = events(2).map(_.key)
    val keyDf = spark.createDataFrame(
      spark.sparkContext.parallelize(keys.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType))))
    t("locate scan (semi join, cast)") {
      cur.select(col("l_orderkey").cast("string").as("_k"), col("l_pbucket"))
        .join(keyDf, col("_k") === keyDf("key"), "left_semi")
        .select(col("l_pbucket").cast("string")).distinct().collect()
    }
    t("locate scan (native isin)") {
      cur.filter(col("l_orderkey").isin(keys.map(_.toLong): _*))
        .select(col("l_pbucket").cast("string")).distinct().collect()
    }
    t("slice read p0")(
      cur.filter(col("l_pbucket").cast("string").isin("0")).count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  /** Piecewise timing of the q85 PageRank stages (r7 regression hunt). */
  private def prProbe(spark: org.apache.spark.sql.SparkSession, dir: String,
                      t: String => (=> Unit) => Unit): Unit = {
    import org.apache.spark.sql.functions._
    val tb = Tables(spark, dir)
    val base = tb.orders
      .join(tb.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
      .distinct()
    t("base distinct")(base.count())
    val edges = base.select(col("a").as("src"), col("b").as("dst"))
      .union(base.select(col("b").as("src"), col("a").as("dst"))).cache()
    t("edges cache+count")(edges.count())
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct().cache()
    t("nodes count")(nodes.count())
    val odeg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    val ej = edges.join(odeg, "src").cache()
    t("ej cache+count")(ej.count())
    var ranks = nodes.select(col("node"), lit(62L).as("r"))
    for (i <- 1 to 3) {
      val contrib = ej.join(ranks, ej("src") === ranks("node"))
        .select(col("dst"), expr("r div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      val next = nodes.join(contrib, col("node") === contrib("dst"), "left")
        .select(col("node"), (lit(9L) + expr("coalesce(m, CAST(0 AS BIGINT))")).as("r"))
      t(s"round $i materialize")(next.count())
      ranks = next
    }
    t("final topk")(ranks.orderBy(col("r").desc, col("node")).limit(20).count())
  }
}
