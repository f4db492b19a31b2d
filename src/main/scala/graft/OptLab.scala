package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 optimization lab: times individual declared queries (or named
  * operator PIECES) under the exact Bench session config, and dumps
  * `.explain("formatted")` plans to plans/r11/ for the before/after
  * evidence the optimization round requires. Never used by the driver —
  * a measurement instrument only, like ScaleLab/BenchScale.
  *
  * Usage:
  *   runMain graft.OptLab time q117_triangles q47_dup_clusters
  *   runMain graft.OptLab explain before q117_triangles ...
  *   runMain graft.OptLab pieces lsh cc tri_id tri_deg
  */
object OptLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // shuffle/compression codec: zstd to MIRROR Bench's session (round 12 —
    // the lab must measure the config the engine benches under);
    // SPARK_GRAFT_CODEC=lz4 re-runs the A/B (static conf — own JVM run)
    val b1 = b0.config("spark.io.compression.codec",
      sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd"))
    val spark = b1.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = new BenchScale.StageMetrics
    spark.sparkContext.addSparkListener(m)
    // per-stage drill-down (env SPARK_GRAFT_OPT_STAGES=1): stage id, task
    // count, executor run/cpu time, shuffle r/w, records — finds stragglers
    if (sys.env.get("SPARK_GRAFT_OPT_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          if (tm != null && tm.executorRunTime > 500)
            println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"run=${tm.executorRunTime / 1e3}%7.1fs cpu=${tm.executorCpuTime / 1e9}%7.1fs " +
              f"shW=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
              f"shR=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
              f"recW=${tm.shuffleWriteMetrics.recordsWritten}%12d " +
              f"recR=${tm.shuffleReadMetrics.recordsRead}%12d  ${si.name.take(60)}")
        }
      })

    def time(name: String, warm: Int = 1, runs: Int = 2)(mk: String => DataFrame): Unit = {
      (1 to warm).foreach { _ =>
        mk(warmDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
      }
      m.settle()
      (1 to runs).foreach { i =>
        m.reset(); System.gc()
        spark.sparkContext.setJobDescription(s"$name run$i")
        val t0 = System.nanoTime()
        mk(sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        m.settle()
        println(f"[opt] $name%-34s run$i wall=${dt}%7.2fs cpu=${m.cpuNs / 1e9}%8.1fs shuffle=${m.shuffleWrite / 1e6}%9.1fMB")
      }
    }

    args.toList match {
      case "time" :: names =>
        names.foreach(n => time(n)(d => SparkEntry.queries(n)(spark, d)))

      case "explain" :: tag :: names =>
        // lazy full plans (withPersisted operators would otherwise
        // checkpoint and truncate the interesting subtrees to LogicalRDD)
        graft.core.Lifecycle.planOnly = true
        val outDir = java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r12"))
        java.nio.file.Files.createDirectories(outDir)
        names.foreach { n =>
          val df = SparkEntry.queries(n)(spark, sfDir)
          val s = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(outDir.resolve(s"${n}_$tag.txt"),
            s.getBytes("UTF-8"))
          println(s"[opt] wrote $outDir/${n}_$tag.txt (${s.length} chars)")
        }

      case "pieces" :: names =>
        import graft.operators.{Dedup, OccurrenceView}
        def docs(d: String) = OccurrenceView.documents(spark, d)
        names.foreach {
          case "sig" => time("sig")(d =>
            Dedup.withMinhashSignature(docs(d)))
          case "bands" => time("bands")(d =>
            Dedup.bandKeys(docs(d)))
          case "lsh" => time("lsh")(d =>
            Dedup.lshCandidatePairs(docs(d), 0.5))
          case "cc" => time("cc") { d =>
            val dd = docs(d)
            Dedup.clustersFromEdges(dd.select("doc_id"),
              Dedup.lshCandidatePairs(dd, 0.5).select("doc_a", "doc_b")
                .localCheckpoint())
          }
          case "tri_id" => time("tri_id")(d =>
            Dedup.triangles(
              Dedup.lshCandidatePairs(docs(d), 0.5).select("doc_a", "doc_b")
                .localCheckpoint(), "id"))
          case "tri_deg" => time("tri_deg")(d =>
            Dedup.triangles(
              Dedup.lshCandidatePairs(docs(d), 0.5).select("doc_a", "doc_b")
                .localCheckpoint(), "degree"))
          case "cc_rounds" =>
            // the clustersFromEdges loop, instrumented per round
            val dd = docs(sfDir)
            val edges = Dedup.lshCandidatePairs(dd, 0.5)
              .select("doc_a", "doc_b").localCheckpoint()
            val sym = edges.union(edges.select(col("doc_b"), col("doc_a")))
              .toDF("src", "dst").localCheckpoint()
            var labels = dd.select(col("doc_id"), col("doc_id").as("cluster_id"))
              .localCheckpoint()
            def labelSum(df: DataFrame): java.math.BigDecimal = {
              val s = df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
              if (s == null) java.math.BigDecimal.ZERO else s
            }
            var prevSum = labelSum(labels)
            var converged = false
            var rounds = 0
            while (!converged && rounds < 20) {
              m.reset()
              val t0 = System.nanoTime()
              val nbMin = sym
                .join(labels.withColumnRenamed("doc_id", "dst_id"), col("dst") === col("dst_id"))
                .groupBy(col("src").as("doc_id"))
                .agg(min("cluster_id").as("nb_min"))
              val stepped = labels.join(nbMin, Seq("doc_id"), "left")
                .select(col("doc_id"),
                  least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id"))).as("cluster_id"))
              val next = stepped.as("a")
                .join(stepped.select(col("doc_id").as("pj_id"), col("cluster_id").as("pj_cl")).as("b"),
                  col("a.cluster_id") === col("pj_id"), "left")
                .select(col("a.doc_id"), coalesce(col("pj_cl"), col("a.cluster_id")).as("cluster_id"))
                .localCheckpoint()
              val nextSum = labelSum(next)
              labels = next
              converged = nextSum.compareTo(prevSum) == 0
              prevSum = nextSum
              rounds += 1
              m.settle()
              println(f"[opt] cc round $rounds wall=${(System.nanoTime() - t0) / 1e9}%6.2fs cpu=${m.cpuNs / 1e9}%7.1fs shuffle=${m.shuffleWrite / 1e6}%8.1fMB converged=$converged")
            }

          case "cc_rounds2" =>
            // variant: stepped checkpointed (node-bounded) so the heavy
            // sym-join subtree runs once per round, not twice via the
            // pointer-jump self-join's two branches
            val dd2 = docs(sfDir)
            val edges2 = Dedup.lshCandidatePairs(dd2, 0.5)
              .select("doc_a", "doc_b").localCheckpoint()
            val sym2 = edges2.union(edges2.select(col("doc_b"), col("doc_a")))
              .toDF("src", "dst").localCheckpoint()
            var labels2 = dd2.select(col("doc_id"), col("doc_id").as("cluster_id"))
              .localCheckpoint()
            def labelSum2(df: DataFrame): java.math.BigDecimal = {
              val s = df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
              if (s == null) java.math.BigDecimal.ZERO else s
            }
            var prevSum2 = labelSum2(labels2)
            var converged2 = false
            var rounds2 = 0
            while (!converged2 && rounds2 < 20) {
              m.reset()
              val t0 = System.nanoTime()
              val nbMin = sym2
                .join(labels2.withColumnRenamed("doc_id", "dst_id"), col("dst") === col("dst_id"))
                .groupBy(col("src").as("doc_id"))
                .agg(min("cluster_id").as("nb_min"))
              val stepped = labels2.join(nbMin, Seq("doc_id"), "left")
                .select(col("doc_id"),
                  least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id"))).as("cluster_id"))
                .localCheckpoint()
              val next = stepped.as("a")
                .join(stepped.select(col("doc_id").as("pj_id"), col("cluster_id").as("pj_cl")).as("b"),
                  col("a.cluster_id") === col("pj_id"), "left")
                .select(col("a.doc_id"), coalesce(col("pj_cl"), col("a.cluster_id")).as("cluster_id"))
                .localCheckpoint()
              val nextSum = labelSum2(next)
              labels2 = next
              converged2 = nextSum.compareTo(prevSum2) == 0
              prevSum2 = nextSum
              rounds2 += 1
              m.settle()
              println(f"[opt] cc2 round $rounds2 wall=${(System.nanoTime() - t0) / 1e9}%6.2fs cpu=${m.cpuNs / 1e9}%7.1fs shuffle=${m.shuffleWrite / 1e6}%8.1fMB converged=$converged2")
            }

          case "tri_int" => time("tri_int") { d =>
            // intersection-based triangle counting over degree-oriented
            // adjacency (Chiba–Nishizeki bound, no triangle-list explode)
            val e = Dedup.lshCandidatePairs(docs(d), 0.5)
              .select("doc_a", "doc_b").localCheckpoint()
            val deg = e.select(col("doc_a").as("doc_id"))
              .unionByName(e.select(col("doc_b").as("doc_id")))
              .groupBy("doc_id").agg(count(lit(1)).as("deg"))
            val ed = e
              .join(deg.select(col("doc_id").as("doc_a"), col("deg").as("da")), "doc_a")
              .join(deg.select(col("doc_id").as("doc_b"), col("deg").as("db")), "doc_b")
            val ka = struct(col("da").as("d"), col("doc_a").as("v"))
            val kb = struct(col("db").as("d"), col("doc_b").as("v"))
            val o = ed.select(
              when(ka < kb, col("doc_a")).otherwise(col("doc_b")).as("src"),
              when(ka < kb, col("doc_b")).otherwise(col("doc_a")).as("dst"))
            val adj = o.groupBy(col("src")).agg(collect_list(col("dst")).as("ns"))
            val emptyArr = expr("CAST(array() AS ARRAY<BIGINT>)")
            val withCs = o
              .join(adj.select(col("src"), col("ns").as("nsa")), Seq("src"), "left")
              .join(adj.select(col("src").as("dst"), col("ns").as("nsb")), Seq("dst"), "left")
              .select(col("src"), col("dst"),
                array_intersect(coalesce(col("nsa"), emptyArr),
                  coalesce(col("nsb"), emptyArr)).as("cs"))
            val contrib = withCs.select(explode(concat(
              array(struct(col("src").as("doc_id"), size(col("cs")).cast("long").as("n")),
                struct(col("dst").as("doc_id"), size(col("cs")).cast("long").as("n"))),
              expr("transform(cs, c -> named_struct('doc_id', c, 'n', CAST(1 AS BIGINT)))"))).as("x"))
            val perNode = contrib
              .groupBy(col("x.doc_id").as("doc_id")).agg(sum(col("x.n")).as("n_tri"))
              .filter(col("n_tri") > 0)
            perNode.join(deg, Seq("doc_id"))
              .withColumn("clust_micro",
                expr("CASE WHEN deg >= 2 THEN n_tri * 2000000 div (deg * (deg - 1)) ELSE CAST(0 AS BIGINT) END"))
              .select("doc_id", "n_tri", "deg", "clust_micro")
          }

          case "lsh_fused" => time("lsh_fused") { d =>
            // signature carried THROUGH the band self-join: no doc_id
            // re-joins for verification, est filter before the distinct
            val M = Dedup.M
            val sig = Dedup.withMinhashSignature(docs(d))
            val mhs = (0 until Dedup.NumHashes).map(k => col(s"mh$k"))
            val bandStructs = (0 until Dedup.NumBands).map { b =>
              struct(lit(b).as("band"),
                ((col(s"mh${2 * b}") * 31 + col(s"mh${2 * b + 1}")) % M).as("bh"))
            }
            val bands = sig
              .select((col("doc_id") +: mhs :+ explode(array(bandStructs: _*)).as("bb")): _*)
              .select((col("doc_id") +: mhs :+ col("bb.band").as("band") :+ col("bb.bh").as("bh")): _*)
            val hot = bands.groupBy("band", "bh").agg(count(lit(1)).as("bsz"))
              .filter(col("bsz") > 1024)
            val capped = bands.join(broadcast(hot.select("band", "bh")),
              Seq("band", "bh"), "left_anti")
            val est = (0 until Dedup.NumHashes)
              .map(k => when(col(s"x.mh$k") === col(s"y.mh$k"), 1).otherwise(0))
              .reduce(_ + _) / lit(Dedup.NumHashes.toDouble)
            capped.as("x").join(capped.as("y"),
                col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
                  col("x.doc_id") < col("y.doc_id"))
              .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
                est.as("est_sim"))
              .filter(col("est_sim") >= 0.5)
              .distinct()
          }

          case "tri_deg_smj" => time("tri_deg_smj") { d =>
            // round-11 shape of the degree-enumeration arm: closure
            // semi-join WITHOUT the broadcast dispatch (the Σout² wedge
            // stream exchanges + sorts) — the A/B baseline for the
            // round-12 closure-probe broadcast in Dedup.triangles
            val e = Dedup.lshCandidatePairs(docs(d), 0.5)
              .select("doc_a", "doc_b").localCheckpoint()
            val deg = e.select(col("doc_a").as("doc_id"))
              .unionByName(e.select(col("doc_b").as("doc_id")))
              .groupBy("doc_id").agg(count(lit(1)).as("deg"))
            val ed = e
              .join(deg.select(col("doc_id").as("doc_a"), col("deg").as("da")), "doc_a")
              .join(deg.select(col("doc_id").as("doc_b"), col("deg").as("db")), "doc_b")
            val ka = struct(col("da").as("d"), col("doc_a").as("v"))
            val kb = struct(col("db").as("d"), col("doc_b").as("v"))
            val o = ed.select(
              when(ka < kb, col("doc_a")).otherwise(col("doc_b")).as("src"),
              when(ka < kb, col("doc_b")).otherwise(col("doc_a")).as("dst"),
              when(ka < kb, kb).otherwise(ka).as("dk"))
              .persist()
            val tri = o.as("w1")
              .join(o.as("w2"),
                col("w1.src") === col("w2.src") && col("w1.dk") < col("w2.dk"))
              .join(o.as("cl"),
                col("w1.dst") === col("cl.src") && col("w2.dst") === col("cl.dst"),
                "left_semi")
              .select(col("w1.src").as("a"), col("w1.dst").as("b"),
                col("w2.dst").as("c"))
            tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
              .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
          }

          case "tri_deg_bc" => time("tri_deg_bc") { d =>
            // round-12 arm: identical inline shape to tri_deg_smj (so the
            // A/B isolates ONE variable) with the closure probe broadcast
            // — calling Dedup.triangles here would make it the OUTERMOST
            // withPersisted and checkpoint the 78 M-row triangle list the
            // real q146 never materializes (nested → lazy)
            val e = Dedup.lshCandidatePairs(docs(d), 0.5)
              .select("doc_a", "doc_b").localCheckpoint()
            val deg = e.select(col("doc_a").as("doc_id"))
              .unionByName(e.select(col("doc_b").as("doc_id")))
              .groupBy("doc_id").agg(count(lit(1)).as("deg"))
            val ed = e
              .join(deg.select(col("doc_id").as("doc_a"), col("deg").as("da")), "doc_a")
              .join(deg.select(col("doc_id").as("doc_b"), col("deg").as("db")), "doc_b")
            val ka = struct(col("da").as("d"), col("doc_a").as("v"))
            val kb = struct(col("db").as("d"), col("doc_b").as("v"))
            val o = ed.select(
              when(ka < kb, col("doc_a")).otherwise(col("doc_b")).as("src"),
              when(ka < kb, col("doc_b")).otherwise(col("doc_a")).as("dst"),
              when(ka < kb, kb).otherwise(ka).as("dk"))
              .persist()
            val tri = o.as("w1")
              .join(o.as("w2"),
                col("w1.src") === col("w2.src") && col("w1.dk") < col("w2.dk"))
              .join(broadcast(o.select(col("src"), col("dst"))).as("cl"),
                col("w1.dst") === col("cl.src") && col("w2.dst") === col("cl.dst"),
                "left_semi")
              .select(col("w1.src").as("a"), col("w1.dst").as("b"),
                col("w2.dst").as("c"))
            tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
              .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
          }

          case s if s.startsWith("pyr_") =>
            // pyramid A/B arms at the q182 shape (z0–z16, chunked
            // iterative), same session, interleavable — each isolates one
            // round-12 variable:
            //   pyr_raw        string map_key + UNPACKED (z,px,py) keys —
            //                  the round-11 shipped shape, inlined
            //   pyr_enc_nopack long map_key + unpacked — isolates the
            //                  algebraic key encoding
            //   pyr_enc        the shipped path (long key + packed zxy)
            val epsg = "EPSG:3857"
            val (minZ, maxZ) = (0, 16)
            import graft.operators.{MapBuild, OccurrenceView}
            val MaxZoom = OccurrenceView.MaxZoom
            // the round-11 levelStats, inlined (unpacked keys)
            def levelStatsUnpacked(top: DataFrame, lowZ: Int, highZ: Int): DataFrame = {
              val zs = array((lowZ to highZ).map(lit): _*)
              val perPixel = top
                .withColumn("z", explode(zs))
                .select(col("map_key"), col("z"),
                  expr(s"shiftright(px, $highZ - z)").as("px"),
                  expr(s"shiftright(py, $highZ - z)").as("py"),
                  col("total"))
                .groupBy("map_key", "z", "px", "py").agg(sum("total").as("total"))
              perPixel.select(col("map_key"), col("z"),
                  (col("px") / OccurrenceView.TileSize).cast("long").as("tx"),
                  (col("py") / OccurrenceView.TileSize).cast("long").as("ty"),
                  lit(1L).as("n_pixels"), col("total"))
                .groupBy("map_key", "z", "tx", "ty")
                .agg(sum("n_pixels").as("n_pixels"), sum("total").as("total"))
                .select("map_key", "tx", "ty", "n_pixels", "total", "z")
            }
            def iterUnpacked(top0: DataFrame): DataFrame = {
              var top = top0
              top.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
              var highZ = maxZ
              var out: DataFrame = null
              while (highZ >= minZ) {
                val lowZ = math.max(minZ, highZ - 7 + 1)
                val chunk = levelStatsUnpacked(top, lowZ, highZ)
                out = if (out == null) chunk else out.unionByName(chunk)
                if (lowZ > minZ) {
                  top = top.select(col("map_key"),
                      shiftright(col("px"), highZ - lowZ + 1).as("px"),
                      shiftright(col("py"), highZ - lowZ + 1).as("py"),
                      col("total"))
                    .groupBy("map_key", "px", "py").agg(sum("total").as("total"))
                  top.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
                }
                highZ = lowZ - 1
              }
              out
            }
            if (s.startsWith("pyr_enc_nopack")) time(s) { d =>
              val s2 = MapBuild.noCoalesceSession(spark)
              val occ = OccurrenceView.occ(s2, d)
              iterUnpacked(MapBuild.withPixels(occ, epsg)
                .select(explode(MapBuild.mapKeyIdsArray).as("map_key"),
                  shiftright(col("px"), MaxZoom - maxZ).as("px"),
                  shiftright(col("py"), MaxZoom - maxZ).as("py"))
                .withColumn("total", lit(1L))
                .groupBy("map_key", "px", "py").agg(sum("total").as("total")))
            }
            else if (s.startsWith("pyr_enc"))
              time(s)(d => MapBuild.pyramid(
                OccurrenceView.occ(MapBuild.noCoalesceSession(spark), d),
                epsg, minZ, maxZ))
            else time(s) { d =>
              val s2 = MapBuild.noCoalesceSession(spark)
              val occ = OccurrenceView.occ(s2, d)
              iterUnpacked(MapBuild.explodeMapKeys(MapBuild.withPixels(occ, epsg))
                .select(col("map_key"),
                  shiftright(col("px"), MaxZoom - maxZ).as("px"),
                  shiftright(col("py"), MaxZoom - maxZ).as("py"),
                  lit(1L).as("total"))
                .groupBy("map_key", "px", "py").agg(sum("total").as("total")))
            }

          case "cal_raw" => time("cal_raw") { d =>
            // round-11 lshCalibration shape (shingle table UNPERSISTED,
            // re-derived per verify-join side) — the A/B baseline for the
            // round-12 withPersisted(sh) change
            val dd = docs(d)
            val pairs = Dedup.lshCandidatePairs(dd, 0.5)
            val sh = dd.withColumn("s", Dedup.shingleSetUdf(col("text")))
              .select(col("doc_id"), col("s"))
            val inter = size(array_intersect(col("a.s"), col("b.s"))).cast("long")
            val uni = size(col("a.s")).cast("long") + size(col("b.s")).cast("long") - inter
            pairs
              .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
              .join(sh.as("b"), col("doc_b") === col("b.doc_id"))
              .select(round(col("est_sim") * 8, 0).cast("int").as("est_agree"),
                inter.as("i"), uni.as("u"))
              .select(col("est_agree"),
                when(col("u") === 0, lit(1000000L))
                  .otherwise(expr("i * 1000000 div u")).as("ex_micro"))
              .groupBy(col("est_agree"), expr("ex_micro div 100000").as("ex_decile"))
              .agg(count(lit(1)).as("n_pairs"), sum("ex_micro").as("sum_ex_micro"))
          }

          case p if p.startsWith("kcore_") =>
            // VERDICT r11 item 9: survivor-edge CARRYING for the k-core
            // peel, A/B'd on a ZIPF-SKEWED graph (the r11 probe measured
            // flat on the near-uniform LSH graph; the skew corpus is the
            // honest test — BenchScale's skew replica builds no documents,
            // so the graph is synthesized directly, deterministic):
            //  - Zipf star: edge k → (100000+k, n/k); node j's in-degree
            //    ≈ n/j² (hubs up to n/2), every tail degree 1 — the whole
            //    star peels in wave 1;
            //  - ring backbone: 100k nodes, chords to ±1, ±2 — degree 4,
            //    the surviving 3-core.
            // kcore_cur = shipped kCoreFromEdges (per round, TWO semi-joins
            // of the FULL edge list against the shrinking survivor set);
            // kcore_carry = live-edge carrying (the edge list itself
            // shrinks: next round counts degrees over carried edges only).
            val n = 2000000L
            val m = 100000L
            def skewEdges: DataFrame = {
              val star = spark.range(1, n + 1).select(
                (col("id") + lit(m)).as("doc_a"),
                expr(s"CAST($n DIV id AS BIGINT)").as("doc_b"))
              val ring = spark.range(0, m).select(col("id").as("doc_a"),
                  pmod(col("id") + 1, lit(m)).as("doc_b"))
                .unionByName(spark.range(0, m).select(col("id").as("doc_a"),
                  pmod(col("id") + 2, lit(m)).as("doc_b")))
              star.unionByName(ring)
            }
            val (kk, rounds) = (3, 4)
            if (p == "kcore_cur") time(p)(_ =>
              Dedup.kCoreFromEdges(skewEdges, kk, rounds))
            else if (p == "kcore_carry") time(p) { _ =>
              import graft.core.Lifecycle.{loopCheckpoint, freeCheckpoint}
              val e = skewEdges.select("doc_a", "doc_b")
              var live = loopCheckpoint(
                e.union(e.select(col("doc_b"), col("doc_a")))
                  .toDF("src", "dst"))
              for (_ <- 1 to rounds) {
                val active = live.groupBy("src").agg(count(lit(1)).as("d"))
                  .filter(col("d") >= kk).select(col("src").as("doc_id"))
                val next = loopCheckpoint(live
                  .join(active.withColumnRenamed("doc_id", "src"), Seq("src"), "left_semi")
                  .join(active.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_semi"))
                freeCheckpoint(live)
                live = next
              }
              val core = live.groupBy(col("src").as("doc_id"))
                .agg(count(lit(1)).as("core_deg")).filter(col("core_deg") >= kk)
              core
            }
            else { // kcore_eq: both arms must emit the identical core
              val cur = Dedup.kCoreFromEdges(skewEdges, kk, rounds)
                .collect().map(_.toSeq).toSet
              val e = skewEdges.select("doc_a", "doc_b")
              var live = e.union(e.select(col("doc_b"), col("doc_a")))
                .toDF("src", "dst").localCheckpoint()
              for (_ <- 1 to rounds) {
                val active = live.groupBy("src").agg(count(lit(1)).as("d"))
                  .filter(col("d") >= kk).select(col("src").as("doc_id"))
                live = live
                  .join(active.withColumnRenamed("doc_id", "src"), Seq("src"), "left_semi")
                  .join(active.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_semi")
                  .localCheckpoint()
              }
              val carry = live.groupBy(col("src").as("doc_id"))
                .agg(count(lit(1)).as("core_deg")).filter(col("core_deg") >= kk)
                .collect().map(_.toSeq).toSet
              println(s"[opt] kcore_eq cur=${cur.size} carry=${carry.size} " +
                s"match=${cur == carry}")
            }

          // any declared query by name — lets one pieces invocation
          // interleave a query with an inline baseline arm (same JVM)
          case q if SparkEntry.queries.contains(q) =>
            time(q)(d => SparkEntry.queries(q)(spark, d))

          case other => println(s"[opt] unknown piece $other")
        }

      case other =>
        println(s"usage: OptLab time|explain|pieces ... (got $other)")
    }
    spark.stop()
  }
}
