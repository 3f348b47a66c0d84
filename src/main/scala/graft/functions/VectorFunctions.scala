package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
import org.apache.spark.sql.types._

/** Vector math over `ArrayType(FloatType|DoubleType)` embedding columns.
  *
  * Implemented as native Catalyst expressions with whole-stage codegen
  * (`doGenCode`) rather than Scala UDFs: the inner loop is a tight primitive
  * loop over `ArrayData`, no boxing, no serialization. Summation is strictly
  * sequential in index order so results are bit-deterministic and match a
  * same-order oracle (DuckDB `list_dot_product` on DOUBLE[]).
  *
  * North-star extension surface (similarity search); the reference has no
  * vector ops — capability added per SURVEY.md §7.2 step 4.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def nullable: Boolean = true

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline protected final def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** dot(a, b) — sequential double-precision dot product. Null on dimension
  * mismatch (silently truncating to the shorter vector would score
  * incomparable vectors as plausible).
  */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var dot = 0.0; var i = 0
    while (i < n) { dot += elem(a, i, lf) * elem(b, i, rf); i += 1 }
    dot
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val ra = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.$la($i) * (double) $b.$ra($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))); null on zero norm. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = elem(a, i, lf); val y = elem(b, i, rf)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val ra = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.$la($i);
         |    double $y = (double) $b.$ra($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All banded hyperplane-LSH signatures of a vector in ONE pass: band b's
  * signature packs the sign bits of `bandBits` consecutive plane dot
  * products into a Long (plane `b·bandBits + i` → bit i). The plane matrix
  * lives INSIDE the expression (a codegen reference object, row-major
  * `double[numPlanes·dim]`) — never inlined as per-plane literal arrays, so
  * the plan string stays O(1) in `numPlanes·dim` and the row cost is one
  * fused loop instead of `numPlanes` separate expression-tree walks.
  *
  * Null when the input vector's dimensionality differs from the planes'
  * (a prefix signature would silently bucket incomparable vectors
  * together — same contract as [[DotProduct]]'s null on mismatch).
  */
/** Shared top-cell routing loop for [[IvfRouteCells]] — one static body
  * called from both interpreted eval and generated code so the paths
  * cannot drift. Scores every centroid with EXACTLY
  * [[CosineSimilarity]]'s arithmetic (double accumulation in element
  * order, dot/(√na·√nb)); keeps the top `nassign` by (score desc, index
  * asc) via strict-> insertion (ties keep the earlier index). Zero
  * vectors and zero centroids score −∞: a directionless vector routes
  * NOWHERE (it has no cell-locality to exploit), and a degenerate
  * centroid attracts nothing.
  */
object IvfRoute {
  def topCells(v: org.apache.spark.sql.catalyst.util.ArrayData,
               isFloat: Boolean, centroids: Array[Double], dim: Int,
               nassign: Int): GenericArrayData = {
    val ncells = centroids.length / dim
    val k = math.min(nassign, ncells)
    var na = 0.0
    var i = 0
    while (i < dim) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      na += x * x; i += 1
    }
    val bs = new Array[Double](k)
    val bi = new Array[Int](k)
    java.util.Arrays.fill(bs, Double.NegativeInfinity)
    var c = 0
    while (c < ncells) {
      var dot = 0.0; var nb = 0.0
      val off = c * dim
      var j = 0
      while (j < dim) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        val y = centroids(off + j)
        dot += x * y; nb += y * y; j += 1
      }
      val s =
        if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
        else dot / (math.sqrt(na) * math.sqrt(nb))
      if (s > bs(k - 1)) {
        var p = k - 1
        while (p > 0 && s > bs(p - 1)) {
          bs(p) = bs(p - 1); bi(p) = bi(p - 1); p -= 1
        }
        bs(p) = s; bi(p) = c
      }
      c += 1
    }
    var kept = 0
    while (kept < k && bs(kept) != Double.NegativeInfinity) kept += 1
    val out = new Array[Int](kept)
    System.arraycopy(bi, 0, out, 0, kept)
    new GenericArrayData(out)
  }
}

/** Two-level routing core shared by eval and codegen: score the
  * `gprobe` best level-1 groups first, then only the cells INSIDE those
  * groups — per row `ngroups + gprobe · avgGroupSize` cosines instead of
  * `ncells` (≈ 2√ncells·(1+gprobe/2) at balanced grouping). Cells arrive
  * GROUP-CONTIGUOUS with `origIdx` mapping position → original cell
  * index and `groupStarts` delimiting groups; ties break by ORIGINAL
  * index on both levels, so with gprobe = ngroups the output is
  * bit-identical to [[IvfRoute.topCells]] over the original matrix
  * (pinned in SketchSpec). Same −∞ conventions as the flat router.
  */
object IvfRouteTwoLevel {
  def topCells(v: org.apache.spark.sql.catalyst.util.ArrayData,
               isFloat: Boolean, groups: Array[Double], cells: Array[Double],
               origIdx: Array[Int], groupStarts: Array[Int], dim: Int,
               gprobe: Int, nassign: Int): GenericArrayData = {
    val ngroups = groups.length / dim
    var na = 0.0
    var i = 0
    while (i < dim) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      na += x * x; i += 1
    }
    def score(mat: Array[Double], off: Int): Double = {
      var dot = 0.0; var nb = 0.0; var j = 0
      while (j < dim) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        val y = mat(off + j)
        dot += x * y; nb += y * y; j += 1
      }
      if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // level 1: top-gprobe groups (score desc, group asc — strict > keeps
    // the earlier group on ties because groups scan in index order)
    val gk = math.min(gprobe, ngroups)
    val gs = new Array[Double](gk)
    val gi = new Array[Int](gk)
    java.util.Arrays.fill(gs, Double.NegativeInfinity)
    var g = 0
    while (g < ngroups) {
      val s = score(groups, g * dim)
      if (s > gs(gk - 1)) {
        var p = gk - 1
        while (p > 0 && s > gs(p - 1)) {
          gs(p) = gs(p - 1); gi(p) = gi(p - 1); p -= 1
        }
        gs(p) = s; gi(p) = g
      }
      g += 1
    }
    // level 2: top-nassign cells across the probed groups; cells are
    // visited in group-selection order (NOT original order), so the
    // insertion must compare ties by ORIGINAL index explicitly
    val k = math.min(nassign, cells.length / dim)
    val bs = new Array[Double](k)
    val bi = new Array[Int](k)
    java.util.Arrays.fill(bs, Double.NegativeInfinity)
    java.util.Arrays.fill(bi, Int.MaxValue)
    var q = 0
    while (q < gk && gs(q) != Double.NegativeInfinity) {
      val grp = gi(q)
      var pos = groupStarts(grp)
      val end = groupStarts(grp + 1)
      while (pos < end) {
        val s = score(cells, pos * dim)
        val oi = origIdx(pos)
        if (s != Double.NegativeInfinity &&
            (s > bs(k - 1) || (s == bs(k - 1) && oi < bi(k - 1)))) {
          var p = k - 1
          while (p > 0 && (s > bs(p - 1) ||
              (s == bs(p - 1) && oi < bi(p - 1)))) {
            bs(p) = bs(p - 1); bi(p) = bi(p - 1); p -= 1
          }
          bs(p) = s; bi(p) = oi
        }
        pos += 1
      }
      q += 1
    }
    var kept = 0
    while (kept < k && bs(kept) != Double.NegativeInfinity) kept += 1
    val out = new Array[Int](kept)
    System.arraycopy(bi, 0, out, 0, kept)
    new GenericArrayData(out)
  }
}

/** Expression form of [[IvfRouteTwoLevel.topCells]] — the hierarchical
  * coarse quantizer the flat router's scaladoc names as the growth path
  * past ~10⁴ cells. All matrices are parameter-sized constructor state.
  */
case class IvfRouteCellsTwoLevel(child: Expression, groups: Array[Double],
    cells: Array[Double], origIdx: Array[Int], groupStarts: Array[Int],
    dim: Int, gprobe: Int, nassign: Int) extends UnaryExpression {
  require(dim >= 1 && gprobe >= 1 && nassign >= 1 &&
    groups.length % dim == 0 && groups.length > 0 &&
    cells.length % dim == 0 && cells.length > 0 &&
    origIdx.length == cells.length / dim &&
    groupStarts.length == groups.length / dim + 1 &&
    groupStarts.head == 0 && groupStarts.last == origIdx.length,
    s"inconsistent two-level routing tables (dim=$dim, groups=${groups.length}, " +
      s"cells=${cells.length}, origIdx=${origIdx.length}, starts=${groupStarts.length})")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> input, got ${other.simpleString}")
    }

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (v.numElements() != dim) return null
    IvfRouteTwoLevel.topCells(v, elemIsFloat, groups, cells, origIdx,
      groupStarts, dim, gprobe, nassign)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val groupsRef = ctx.addReferenceObj("groups", groups, "double[]")
    val cellsRef = ctx.addReferenceObj("cells", cells, "double[]")
    val origRef = ctx.addReferenceObj("origIdx", origIdx, "int[]")
    val startsRef = ctx.addReferenceObj("groupStarts", groupStarts, "int[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.IvfRouteTwoLevel.topCells(
         |    $v, $elemIsFloat, $groupsRef, $cellsRef, $origRef, $startsRef,
         |    $dim, $gprobe, $nassign);
         |}
       """.stripMargin)
  }

  override def toString: String =
    s"ivf_route_cells_2l($child, groups=${groups.length / dim}, " +
      s"cells=${cells.length / dim}x$dim, gprobe=$gprobe, nassign=$nassign)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-`nassign` IVF cell INDICES (into the flattened row-major centroid
  * matrix, which the caller keeps sorted by cell id so index order IS id
  * order) — the zero-shuffle routing map for
  * [[graft.operators.Dedup.semanticNearDupsIvf]]: the previous
  * crossJoin + collect_list formulation shuffled the FULL n × ncells
  * score expansion (collect_list partial buffers do not reduce volume);
  * this expression is a pure per-row map, the same plan shape the LSH
  * banding path uses for its plane matrix.
  */
case class IvfRouteCells(child: Expression, centroids: Array[Double],
    dim: Int, nassign: Int) extends UnaryExpression {
  require(dim >= 1 && nassign >= 1 && centroids.length % dim == 0 &&
    centroids.length > 0,
    s"centroids length ${centroids.length} must be a positive multiple of dim=$dim")

  val ncells: Int = centroids.length / dim
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> input, got ${other.simpleString}")
    }

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (v.numElements() != dim) return null
    IvfRoute.topCells(v, elemIsFloat, centroids, dim, nassign)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centroidsRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.IvfRoute.topCells(
         |    $v, $elemIsFloat, $centroidsRef, $dim, $nassign);
         |}
       """.stripMargin)
  }

  override def toString: String =
    s"ivf_route_cells($child, cells=${ncells}x$dim, nassign=$nassign)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class HyperplaneSignatures(child: Expression, planes: Array[Double],
    dim: Int, bandBits: Int) extends UnaryExpression {
  require(dim >= 1 && bandBits >= 1 && bandBits <= 64 &&
    planes.length % (dim.toLong * bandBits) == 0 && planes.length > 0,
    s"planes length ${planes.length} must be a positive multiple of dim=$dim * bandBits=$bandBits (bandBits in [1,64])")

  private val numPlanes: Int = planes.length / dim
  val numBands: Int = numPlanes / bandBits

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> input, got ${other.simpleString}")
    }

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val sigs = new Array[Long](numBands)
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      val off = p * dim
      var j = 0
      while (j < dim) {
        val x = if (elemIsFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * planes(off + j)
        j += 1
      }
      if (acc > 0.0) sigs(p / bandBits) |= (1L << (p % bandBits))
      p += 1
    }
    new GenericArrayData(sigs)
  }

  /** Same plane-major / dim-sequential loop as [[nullSafeEval]] so the two
    * paths are bit-identical (asserted in SketchSpec).
    */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, v => {
      val sigs = ctx.freshName("sigs"); val p = ctx.freshName("p")
      val acc = ctx.freshName("acc"); val off = ctx.freshName("off")
      val j = ctx.freshName("j")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sigs = new long[$numBands];
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    double $acc = 0.0;
         |    int $off = $p * $dim;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += (double) $v.$getter($j) * $planesRef[$off + $j];
         |    }
         |    if ($acc > 0.0) $sigs[$p / $bandBits] |= (1L << ($p % $bandBits));
         |  }
         |  ${ev.value} = new $gad($sigs);
         |}
       """.stripMargin
    })
  }

  // keep the plan string bounded: the default case-class toString would not
  // print the array contents anyway, but be explicit about the shape
  override def toString: String =
    s"hyperplane_signatures($child, planes=${numPlanes}x$dim, bandBits=$bandBits)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared core of [[HyperplaneProbes]] — query-directed probing (Lv,
  * Josephson, Wang, Charikar &amp; Li, "Multi-Probe LSH", VLDB 2007 §4.2):
  * per band, the base signature followed by the `numProbes` best
  * perturbation SETS, where candidates are every non-empty subset of at
  * most `maxFlip` band bits and "best" means smallest SUMMED margin
  * Σ |dot| over the flipped bits (a similar vector most plausibly
  * disagrees on exactly the small-margin planes), ties by mask
  * ascending. `maxFlip = 1` is the classic margin-ranked single-flip
  * set; `maxFlip = 2` adds pair flips, so a 2-bit disagreement on two
  * near-zero margins out-ranks a 1-bit flip on a confident plane — the
  * probing sequence that lets a band hold recall with FEWER probes than
  * the full single-flip sweep (the sequence is a strict prefix
  * refinement: more probes never remove earlier ones).
  *
  * Margin sums are fixed-order doubles (absd(i) + absd(j), i &lt; j), so
  * an external SQL engine replays the exact probe ranking with
  * `abs(d_i) + abs(d_j) … ORDER BY sum ASC, mask ASC` — the probe-set
  * oracle discipline: ONE definition, both engines derive it.
  *
  * Shared by interpreted eval and codegen (the generated code calls this
  * method), so the two paths are bit-identical by construction.
  */
object HyperplaneProbeGen {
  def probes(v: ArrayData, isFloat: Boolean, planes: Array[Double],
             dim: Int, bandBits: Int, numProbes: Int,
             maxFlip: Int): GenericArrayData = {
    val numBands = planes.length / dim / bandBits
    val ncand =
      if (maxFlip <= 1) bandBits
      else bandBits + bandBits * (bandBits - 1) / 2
    val t = math.min(numProbes, ncand)
    val out = new Array[AnyRef](numBands)
    val absd = new Array[Double](bandBits)
    val sums = new Array[Double](ncand)
    val masks = new Array[Long](ncand)
    var b = 0
    while (b < numBands) {
      var sig = 0L
      var i = 0
      while (i < bandBits) {
        var acc = 0.0
        val off = (b * bandBits + i) * dim
        var j = 0
        while (j < dim) {
          val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
          acc += x * planes(off + j)
          j += 1
        }
        if (acc > 0.0) sig |= (1L << i)
        absd(i) = math.abs(acc)
        i += 1
      }
      // candidate flip sets: singles in bit order, then pairs (i < j) —
      // sums in ascending-bit addition order so the SQL replay's
      // abs(d_i) + abs(d_j) lands on the identical double
      var c = 0
      var i1 = 0
      while (i1 < bandBits) {
        sums(c) = absd(i1); masks(c) = 1L << i1; c += 1; i1 += 1
      }
      if (maxFlip >= 2) {
        var a = 0
        while (a < bandBits) {
          var d2 = a + 1
          while (d2 < bandBits) {
            sums(c) = absd(a) + absd(d2)
            masks(c) = (1L << a) | (1L << d2)
            c += 1; d2 += 1
          }
          a += 1
        }
      }
      // partial selection of the t smallest (sum, mask) — t and ncand are
      // both small (ncand ≤ b + b(b−1)/2, b ≤ 24 when pairs are on)
      val sigs = new Array[Long](t + 1)
      sigs(0) = sig
      val used = new Array[Boolean](ncand)
      var s = 0
      while (s < t) {
        var best = -1
        var c2 = 0
        while (c2 < ncand) {
          if (!used(c2) && (best < 0 || sums(c2) < sums(best) ||
              (sums(c2) == sums(best) && masks(c2) < masks(best)))) best = c2
          c2 += 1
        }
        used(best) = true
        sigs(s + 1) = sig ^ masks(best)
        s += 1
      }
      out(b) = new GenericArrayData(sigs)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Expression form of [[HyperplaneProbeGen.probes]]: per band, base
  * signature + the `numProbes` smallest-summed-margin flip sets of ≤
  * `maxFlip` bits (see the core's scaladoc for the exact ranking and the
  * SQL-replay discipline). `maxFlip = 1, numProbes = q` reproduces the
  * classic margin-ranked single-flip probe set bit-for-bit (mask order
  * equals bit order for singles); when additionally `numProbes ≥
  * bandBits` the SET equals the naive all-single-flips one, so
  * small-corpus behavior degenerates gracefully. Returns
  * `array&lt;array&lt;long&gt;&gt;` — outer = band, inner = 1 + min(numProbes,
  * ncand) signatures, base first. Null on dimension mismatch (same
  * contract as [[HyperplaneSignatures]]).
  */
case class HyperplaneProbes(child: Expression, planes: Array[Double],
    dim: Int, bandBits: Int, numProbes: Int, maxFlip: Int)
    extends UnaryExpression {
  require(dim >= 1 && bandBits >= 1 && bandBits <= 64 && numProbes >= 0 &&
    maxFlip >= 1 && maxFlip <= 2 &&
    planes.length % (dim.toLong * bandBits) == 0 && planes.length > 0,
    s"planes length ${planes.length} must be a positive multiple of " +
      s"dim=$dim * bandBits=$bandBits (bandBits in [1,64], numProbes >= 0, " +
      s"maxFlip in [1,2])")
  require(maxFlip == 1 || bandBits <= 24,
    s"pair probing (maxFlip=2) is bounded to bandBits <= 24 " +
      s"(candidate sets grow quadratically); got bandBits=$bandBits")

  private val numPlanes: Int = planes.length / dim
  val numBands: Int = numPlanes / bandBits

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> input, got ${other.simpleString}")
    }

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    HyperplaneProbeGen.probes(v, elemIsFloat, planes, dim, bandBits,
      numProbes, maxFlip)
  }

  /** Generated code calls the SAME core as interpreted eval, so the two
    * paths are bit-identical by construction (asserted in SketchSpec).
    */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.HyperplaneProbeGen.probes(
         |    $v, $elemIsFloat, $planesRef, $dim, $bandBits, $numProbes,
         |    $maxFlip);
         |}
       """.stripMargin)
  }

  override def toString: String =
    s"hyperplane_probes($child, planes=${numPlanes}x$dim, " +
      s"bandBits=$bandBits, numProbes=$numProbes, maxFlip=$maxFlip)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ-encode a vector in ONE pass: for each of the `m` subspaces, the code
  * is the codebook cell minimizing L2 distance to the subvector (argmax of
  * 2·⟨sv,c⟩ − ‖c‖², ties to the lowest cell — the exact max_by semantics of
  * the former join-based encoder). The codebook lives INSIDE the expression
  * (codegen reference object, `double[m·ksub·dsub]` row-major) — encoding
  * is a map-only projection: no explode, no join, no shuffle, which at
  * corpus scale replaces two corpus-sized shuffles with zero.
  *
  * Null when the vector's dimensionality differs from m·dsub (a prefix
  * encode would silently quantize incomparable vectors).
  */
case class PqEncodeCodes(child: Expression, codebook: Array[Double],
    cnorm2: Array[Double], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {
  require(m >= 1 && ksub >= 1 && dsub >= 1 &&
    codebook.length == m * ksub * dsub && cnorm2.length == m * ksub,
    s"codebook ${codebook.length}/cnorm2 ${cnorm2.length} must be m=$m × ksub=$ksub × dsub=$dsub")

  private val dim = m * dsub

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> input, got ${other.simpleString}")
    }

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        val off = (s * ksub + c) * dsub
        var j = 0
        while (j < dsub) {
          val x = if (elemIsFloat) v.getFloat(s * dsub + j).toDouble
                  else v.getDouble(s * dsub + j)
          acc += x * codebook(off + j)
          j += 1
        }
        val score = 2.0 * acc - cnorm2(s * ksub + c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Same subspace-major / cell / dim-sequential loop as [[nullSafeEval]]
    * so the two paths are bit-identical (asserted in SketchSpec).
    */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    val normRef = ctx.addReferenceObj("pqCnorm2", cnorm2, "double[]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes"); val s = ctx.freshName("s")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc"); val off = ctx.freshName("off")
      val best = ctx.freshName("best"); val bestScore = ctx.freshName("bestScore")
      val score = ctx.freshName("score")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $best = 0;
         |    double $bestScore = Double.NEGATIVE_INFINITY;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      double $acc = 0.0;
         |      int $off = ($s * $ksub + $c) * $dsub;
         |      for (int $j = 0; $j < $dsub; $j++) {
         |        $acc += (double) $v.$getter($s * $dsub + $j) * $bookRef[$off + $j];
         |      }
         |      double $score = 2.0 * $acc - $normRef[$s * $ksub + $c];
         |      if ($score > $bestScore) { $bestScore = $score; $best = $c; }
         |    }
         |    $codes[$s] = $best;
         |  }
         |  ${ev.value} = new $gad($codes);
         |}
       """.stripMargin
    })
  }

  override def toString: String =
    s"pq_encode($child, codebook=${m}x${ksub}x$dsub)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Reconstructed squared norm of a PQ-coded vector: Σ_s ‖centroid(s,
  * codes[s])‖² — an m-element table lookup against the codebook norms held
  * in the expression. Sequential fixed-order sum (deterministic), null on
  * a malformed code array.
  */
case class PqCodesNorm2(child: Expression, cnorm2: Array[Double],
    m: Int, ksub: Int) extends UnaryExpression {
  require(m >= 1 && ksub >= 1 && cnorm2.length == m * ksub,
    s"cnorm2 ${cnorm2.length} must be m=$m × ksub=$ksub")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != m) return null
    var n2 = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) return null
      n2 += cnorm2(s * ksub + c)
      s += 1
    }
    n2
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val normRef = ctx.addReferenceObj("pqCnorm2", cnorm2, "double[]")
    nullSafeCodeGen(ctx, ev, codes => {
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val n2 = ctx.freshName("n2"); val bad = ctx.freshName("bad")
      s"""
         |if ($codes.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $n2 = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $c = $codes.getInt($s);
         |    if ($c < 0 || $c >= $ksub) { $bad = true; break; }
         |    $n2 += $normRef[$s * $ksub + $c];
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $n2; }
         |}
       """.stripMargin
    })
  }

  override def toString: String = s"pq_codes_norm2($child, ${m}x$ksub)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API: sequential-order double dot product of two vector columns. */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Column API: cosine similarity of two vector columns (null on zero norm). */
  def cosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** Column API: top-`nassign` IVF cell indices against a flattened
    * row-major centroid matrix (caller keeps centroid rows sorted by cell
    * id so index order is id order).
    */
  def ivfRouteCells(vec: Column, centroids: Array[Double], dim: Int,
                    nassign: Int): Column =
    column(IvfRouteCells(expression(vec), centroids, dim, nassign))

  /** Column API: two-level routing — top-`gprobe` groups, then
    * top-`nassign` cells inside them. Returns ORIGINAL cell indices.
    */
  def ivfRouteCellsTwoLevel(vec: Column, groups: Array[Double],
      cells: Array[Double], origIdx: Array[Int], groupStarts: Array[Int],
      dim: Int, gprobe: Int, nassign: Int): Column =
    column(IvfRouteCellsTwoLevel(expression(vec), groups, cells, origIdx,
      groupStarts, dim, gprobe, nassign))

  /** Column API: all banded hyperplane signatures (array&lt;long&gt;, one Long
    * per band) of a vector column in one fused pass.
    */
  def hyperplaneSignatures(vec: Column, planes: Array[Array[Double]], bandBits: Int): Column = {
    require(planes.nonEmpty, "need at least one hyperplane")
    val dim = planes.head.length
    require(planes.forall(_.length == dim), "all hyperplanes must share one dimensionality")
    column(HyperplaneSignatures(expression(vec), planes.flatten, dim, bandBits))
  }

  /** Column API: query-directed multi-probe signature sets
    * (array&lt;array&lt;long&gt;&gt;, per band: base signature + the `numProbes`
    * smallest-summed-margin flip sets of ≤ `maxFlip` bits) in one fused
    * pass. `maxFlip = 1` is the classic margin-ranked single-flip set.
    */
  def hyperplaneProbes(vec: Column, planes: Array[Array[Double]],
                       bandBits: Int, numProbes: Int,
                       maxFlip: Int = 1): Column = {
    require(planes.nonEmpty, "need at least one hyperplane")
    val dim = planes.head.length
    require(planes.forall(_.length == dim), "all hyperplanes must share one dimensionality")
    // the expression hard-bounds pair probing to bandBits <= 24 (the
    // ≤2-bit candidate set grows quadratically in bandBits); operators
    // feed this wrapper lshGeometry's log-n-WIDENED bandBits, so on a
    // sufficiently large corpus maxFlip=2 would otherwise throw at plan
    // construction. Degrading to single-flip probing is the right
    // large-corpus behavior (wider bands already cut the per-bucket
    // collision mass that pair probes exist to recover), so clamp + warn
    // here rather than propagate the constructor require.
    val flip =
      if (maxFlip >= 2 && bandBits > 24) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"hyperplaneProbes: clamping maxFlip=$maxFlip to 1 — " +
            s"bandBits=$bandBits exceeds the pair-probe bound of 24")
        1
      } else maxFlip
    column(HyperplaneProbes(expression(vec), planes.flatten, dim, bandBits,
      math.min(numProbes,
        if (flip <= 1) bandBits else bandBits + bandBits * (bandBits - 1) / 2),
      flip))
  }

  /** Column API: PQ codes (array&lt;int&gt;, one cell per subspace) of a
    * vector column against a flattened row-major codebook.
    */
  def pqEncodeCodes(vec: Column, codebook: Array[Double], cnorm2: Array[Double],
                    m: Int, ksub: Int, dsub: Int): Column =
    column(PqEncodeCodes(expression(vec), codebook, cnorm2, m, ksub, dsub))

  /** Column API: reconstructed ‖x‖² from a PQ code column. */
  def pqCodesNorm2(codes: Column, cnorm2: Array[Double], m: Int, ksub: Int): Column =
    column(PqCodesNorm2(expression(codes), cnorm2, m, ksub))
}
