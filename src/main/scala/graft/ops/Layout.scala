package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Lineage._

/** Multi-dimensional data layout for scan pruning at 100 TB: Z-order
  * (Morton) clustering. Sorting a table by one column gives perfect
  * min/max pruning on that column and none on any other; interleaving the
  * bits of several quantized columns into one sort key gives every
  * interleaved column locality, so file-level min/max statistics prune
  * scans filtered on ANY of them (the standard lakehouse OPTIMIZE ZORDER
  * BY). The z-value is a pure per-row expression — quantize each column
  * against its global range, interleave bits — so the whole operator is
  * one range repartition + within-partition sort, exactly the shuffle a
  * plain global sort costs.
  *
  * Quantization needs each column's global (min, max): computed in one
  * tiny aggregate and attached via a broadcast cross join (one row), so
  * the plan stays fully declarative — no driver-side collect between the
  * stats and the layout.
  */
object Layout {

  /** Morton interleave of already-quantized non-negative long columns
    * (each in [0, 2^bits)): bit b of column i lands at position
    * b * numCols + i. Total bits must fit a signed long. */
  def interleaveBits(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty, "need at least one column")
    require(bits >= 1 && bits * qs.size <= 62,
      s"bits * cols must fit a signed long, got $bits * ${qs.size}")
    val terms = for {
      b <- 0 until bits
      (q, i) <- qs.zipWithIndex
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)),
      b * qs.size + i)
    terms.reduce((a, c) => a.bitwiseOR(c)).cast("long")
  }

  /** Scales `x` from [lo, hi] onto the integer grid [0, 2^bits); a
    * degenerate range (hi = lo) maps everything to 0. */
  def quantize(x: Column, lo: Column, hi: Column, bits: Int): Column = {
    val cells = (1L << bits) - 1
    when(hi <= lo, lit(0L)).otherwise(
      floor((x.cast("double") - lo.cast("double")) * cells /
        (hi.cast("double") - lo.cast("double"))).cast("long"))
  }

  /** Adds a `zval` column: the Morton code of the given numeric columns,
    * each quantized to `bits` bits against its global min/max (computed
    * in one one-row aggregate, attached by broadcast cross join). */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val stats = df.agg(
      min(col(cols.head)).as(s"__lo_0"),
      (max(col(cols.head)).as(s"__hi_0") +:
        cols.tail.zipWithIndex.flatMap { case (c, i) =>
          Seq(min(col(c)).as(s"__lo_${i + 1}"),
            max(col(c)).as(s"__hi_${i + 1}"))
        }): _*)
    val qs = cols.zipWithIndex.map { case (c, i) =>
      quantize(col(c), col(s"__lo_$i"), col(s"__hi_$i"), bits)
    }
    df.crossJoin(broadcast(stats))
      .withColumn("zval", interleaveBits(qs, bits))
      .drop(cols.indices.flatMap(i => Seq(s"__lo_$i", s"__hi_$i")): _*)
  }

  /** Small-file compaction plan: assign files (or any sized work units)
    * to contiguous output groups of ~`targetBytes` each — the rewrite
    * plan that fixes the many-small-files problem a streaming/append
    * pipeline accumulates (every file under ~100 MB costs a task and a
    * footer read per scan). Files are taken in ascending `idCol` order
    * and a group is the files whose cumulative byte range falls in one
    * target-sized window, so groups are stable under retries and
    * incremental re-planning. Runs on [[Packing.packChunks]]'s two-phase
    * distributed prefix sum — no single-reducer cumulative window.
    * Returns (id, bytes, group_id): a file joins the group whose window
    * its cumulative start offset falls in, so every group reaches the
    * target before the next opens (a file larger than the target
    * overfills its group; skip such files upstream if rewrite cost is
    * the concern). */
  def compactionGroups(files: DataFrame, idCol: String,
      bytes: org.apache.spark.sql.Column, targetBytes: Long): DataFrame = {
    // packChunks blocks on a numeric id range: a string id (file PATHS,
    // the natural mistake) would cast to all-null longs and silently
    // collapse every file into group 0 — assign dense numeric ids
    // upstream (e.g. via row ordinal on the file listing) instead
    val idType = files.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long")
      .contains(idType.typeName),
      s"compactionGroups needs an integral id column, got $idCol: " +
        s"${idType.typeName} — number the file listing first")
    Packing.packChunks(files, idCol, bytes, targetBytes)
      .select(col("id"), col("n_tokens").as("bytes"),
        col("first_chunk").as("group_id"))
  }

  /** Z-order the table: compute `zval` and lay rows out by it (range
    * repartition so partitions are contiguous z-ranges, then sort within
    * partitions — the same two steps a plain global sort costs). A
    * downstream partitioned/bucketed write then produces files whose
    * min/max stats are tight on EVERY interleaved column. */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 16,
      partitions: Option[Int] = None): DataFrame = {
    val z = withZValue(df, cols, bits)
    val ranged = partitions match {
      case Some(n) => z.repartitionByRange(n, col("zval"))
      case None => z.repartitionByRange(col("zval"))
    }
    ranged.sortWithinPartitions(col("zval"))
  }

  /** 2-D Hilbert-curve index of two `bits`-bit coordinates — the
    * data-layout key with strictly better locality than the Z-order
    * curve ([[withZValue]]): a Z-curve takes long diagonal jumps at
    * quadrant boundaries (adjacent keys can be spatially far apart,
    * which widens the min/max range per file and weakens data
    * skipping), while the Hilbert curve is continuous — consecutive
    * keys are ALWAYS spatially adjacent cells, so per-file coordinate
    * ranges stay tight and two-column range predicates prune more
    * files.
    *
    * Pure integer column arithmetic: the classic xy→d walk (Hamilton's
    * formulation) unrolled over the `bits` levels — per level the
    * quadrant digit `(3·rx) xor ry` scales by s², then the frame
    * rotates/reflects. No UDF, whole-stage-codegen friendly, and the
    * identical CASE arithmetic is replayable in ANSI SQL (the xor is
    * expressed as a 4-way CASE so no engine-specific bit op is
    * needed). Inputs must already lie in [0, 2^bits). */
  def withHilbertValue(df: DataFrame, xCol: String, yCol: String,
      bits: Int, out: String = "hval"): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    // One named projection per level: expressing the walk as a single
    // nested Column would double the expression tree at every level
    // (each level reads x and y several times) — 4^bits nodes. As
    // per-level named columns each level is one Project reading the
    // previous level's columns by name, so plan size is linear in
    // `bits` (and CollapseProject keeps multiply-referenced non-cheap
    // aliases un-inlined).
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn("__hd", lit(0L))
    var s = 1L << (bits - 1)
    while (s >= 1L) {
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(0L)
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(0L)
      // (3*rx) xor ry as a 4-way CASE (portable to the oracle)
      val quad = when(rx === 0 && ry === 0, lit(0L))
        .when(rx === 0 && ry === 1, lit(1L))
        .when(rx === 1 && ry === 1, lit(2L))
        .otherwise(lit(3L))
      // rotate/reflect the frame for the next level
      val nx = when(ry === 0,
        when(rx === 1, lit(s - 1) - col("__hy"))
          .otherwise(col("__hy"))).otherwise(col("__hx"))
      val ny = when(ry === 0,
        when(rx === 1, lit(s - 1) - col("__hx"))
          .otherwise(col("__hx"))).otherwise(col("__hy"))
      cur = cur.withColumns(Map(
        "__hd" -> (col("__hd") + lit(s * s) * quad),
        "__hx" -> nx, "__hy" -> ny))
      s >>= 1
    }
    cur.withColumn(out, col("__hd"))
      .drop("__hx", "__hy", "__hd")
  }

  /** Run-length (RLE) layout audit: for each audited column, the exact
    * number of value RUNS the column would store under the given
    * physical order — the storage-engine question behind "should we
    * sort on ingest": runs ≈ distinct values means near-perfect RLE,
    * runs ≈ rows means the encoding buys nothing. n_distinct is the
    * floor a value-clustered layout would achieve, reported alongside.
    *
    * NO GLOBAL SORT: rows sort only within `block` partitions (window
    * keyed by block), per-block first/last values ride min/max structs
    * on the (orderCol, tieCol) axis, and cross-block transitions come
    * from joining each block to its successor on the block-domain
    * table (O(blocks) rows). runs = within-block transitions +
    * boundary transitions + 1. Null-safe comparisons throughout, so a
    * NULL run counts like any other. Blocks must partition the order:
    * b1 < b2 ⟹ every row of b1 precedes b2 (an hour bucket of the
    * ordering timestamp, in the audit query). */
  def rleRunsReport(df: DataFrame, block: Column, orderCol: Column,
      tieCol: Column, values: Seq[(String, Column)]): DataFrame = {
    require(values.nonEmpty, "need at least one audited column")
    val base = df.select(Seq(block.as("b"), orderCol.as("o"),
      tieCol.as("t")) ++
      values.zipWithIndex.map { case ((_, c), i) => c.as(s"__v$i") }: _*)
      .where(col("b").isNotNull && col("o").isNotNull &&
        col("t").isNotNull)
    val w = Window.partitionBy(col("b"))
      .orderBy(col("o").asc, col("t").asc)
    val withChg = values.indices.foldLeft(base) { (d, i) =>
      // block-first rows contribute 0 (the global first run is the +1;
      // block boundaries are counted from the per-block first/last
      // table); mid-block nulls are handled by the null-safe compare
      d.withColumn(s"__chg$i",
        when(row_number().over(w) === 1, 0L)
          .otherwise(when(!(col(s"__v$i") <=>
            lag(col(s"__v$i"), 1).over(w)), 1L).otherwise(0L)))
    }
    val bsAggs = Seq(count(lit(1)).as("n_rows")) ++
      values.indices.flatMap { i =>
        Seq(sum(col(s"__chg$i")).as(s"__chgs$i"),
          min(struct(col("o"), col("t"), col(s"__v$i")))
            .getField(s"__v$i").as(s"__first$i"),
          max(struct(col("o"), col("t"), col(s"__v$i")))
            .getField(s"__v$i").as(s"__last$i"))
      }
    val blockStats = withChg.groupBy(col("b"))
      .agg(bsAggs.head, bsAggs.tail: _*)
      .truncateLineage(eager = false)
    // boundary transitions between consecutive EXISTING blocks (block
    // ids may have holes, so b+1 adjacency would undercount): the
    // per-block first/last table is block-domain-sized — the same
    // driver-side-fold contract as the q224 blocked suffix offsets
    val edge = blockStats
      .select(Seq(col("b")) ++ values.indices.flatMap(i =>
        Seq(col(s"__first$i"), col(s"__last$i"))): _*)
      .collect().sortBy(_.getAs[Any]("b") match {
        case l: Long => l
        case i: Int => i.toLong
      })
    val boundary: Seq[Long] = values.indices.map { i =>
      edge.sliding(2).count {
        case Array(a, c) =>
          val lastA = a.getAs[Any](s"__last$i")
          val firstC = c.getAs[Any](s"__first$i")
          lastA != firstC
        case _ => false
      }.toLong
    }
    val totAggs = Seq(sum(col("n_rows")).as("n_rows")) ++
      values.indices.map { i =>
        (sum(col(s"__chgs$i")) + lit(boundary(i))).as(s"__runs$i")
      }
    val totals = blockStats.agg(totAggs.head, totAggs.tail: _*)
    val distincts = base.agg(
      values.indices.map(i =>
        count_distinct(col(s"__v$i")).as(s"__nd$i")).head,
      values.indices.drop(1).map(i =>
        count_distinct(col(s"__v$i")).as(s"__nd$i")): _*)
    val stacked = totals.crossJoin(broadcast(distincts))
    val stackArgs = values.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', n_rows, __runs$i + 1, __nd$i"
    }.mkString(", ")
    stacked.select(expr(s"stack(${values.size}, $stackArgs) " +
        "AS (column_name, n_rows, n_runs, n_distinct)"))
      .select(col("column_name"), col("n_rows"), col("n_runs"),
        col("n_distinct"),
        expr("n_runs * 1000000 div greatest(1, n_rows)")
          .as("runs_ppm"))
  }

  /** Zone-map (min/max data-skipping) effectiveness report: bucket the
    * table by a layout expression (a stand-in for files/row-groups in
    * layout order), record each bucket's min/max of the predicate
    * column, and for each literal range predicate count how many
    * buckets — and rows — a zone-map reader would SKIP (zone disjoint
    * from the range) versus what actually matches. The output is the
    * report that justifies (or kills) a re-layout: the same predicates
    * against an aligned layout show skip rates near the selectivity,
    * against a random layout near zero.
    *
    * Per (layout, predicate): buckets, pruned buckets, rows skipped,
    * rows that match, and scan efficiency = matching / scanned rows in
    * exact ppm. One pass builds the zone table (groupBy bucket —
    * O(buckets) rows); predicates attach to it as a constant-size
    * literal frame (the q204-family justified nested-loop). All
    * arithmetic exact longs. */
  def zoneMapReport(df: DataFrame, layoutName: String, bucket: Column,
      value: Column, predicates: Seq[(String, Long, Long)]): DataFrame = {
    require(predicates.nonEmpty, "need at least one predicate")
    val zones = df
      .select(bucket.cast("long").as("bucket"), value.cast("long").as("v"))
      .where(col("bucket").isNotNull && col("v").isNotNull)
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("zmin"), max(col("v")).as("zmax"),
        count(lit(1)).as("n_rows"))
    val preds = predicates.map { case (name, lo, hi) =>
      struct(lit(name).as("predicate"), lit(lo).as("lo"),
        lit(hi).as("hi"))
    }
    val pf = zones.sparkSession.range(1)
      .select(explode(array(preds: _*)).as("p"))
      .select(col("p.predicate"), col("p.lo"), col("p.hi"))
    // actual matching rows for ALL predicates in ONE data pass (a
    // conditional-sum column per predicate — no row multiplication),
    // then melted to (predicate, rows_matching)
    val matchAggs = predicates.zipWithIndex.map { case ((_, lo, hi), i) =>
      sum(when(col("v") >= lo && col("v") <= hi, 1L).otherwise(0L))
        .as(s"__m$i")
    }
    val matchRow = df.select(value.cast("long").as("v"))
      .where(col("v").isNotNull)
      .agg(matchAggs.head, matchAggs.tail: _*)
    val stackArgs = predicates.zipWithIndex.map { case ((name, _, _), i) =>
      s"'${name.replace("'", "''")}', __m$i"
    }.mkString(", ")
    val matching = matchRow.select(expr(
      s"stack(${predicates.size}, $stackArgs) AS (predicate, " +
        "rows_matching)"))
    zones.crossJoin(broadcast(pf))
      .withColumn("pruned",
        (col("zmax") < col("lo") || col("zmin") > col("hi"))
          .cast("long"))
      .groupBy(col("predicate"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("pruned")).as("n_pruned"),
        sum(col("pruned") * col("n_rows")).as("rows_skipped"),
        sum(col("n_rows")).as("rows_total"))
      .join(broadcast(matching), Seq("predicate"), "left")
      .select(lit(layoutName).as("layout"), col("predicate"),
        col("n_buckets"), col("n_pruned"), col("rows_skipped"),
        coalesce(col("rows_matching"), lit(0L)).as("rows_matching"),
        expr("""coalesce(rows_matching, 0) * 1000000
          div greatest(1, rows_total - rows_skipped)""")
          .as("scan_efficiency_ppm"))
  }
}
