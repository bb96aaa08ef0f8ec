package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Shared input-type guards: these expressions read array elements with
  * `getFloat`/`getDouble`, which silently reinterprets bytes if handed the
  * wrong element type — so reject mismatches at analysis time instead. */
private[expressions] object VecTypeCheck {
  def arrayOf(elem: DataType, dt: DataType, name: String, arg: String): TypeCheckResult =
    dt match {
      case ArrayType(`elem`, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires $arg of type array<${elem.simpleString}>, got ${other.simpleString}")
    }
  def bothArraysOf(elem: DataType, l: DataType, r: DataType, name: String): TypeCheckResult =
    arrayOf(elem, l, name, "left") match {
      case TypeCheckResult.TypeCheckSuccess => arrayOf(elem, r, name, "right")
      case fail => fail
    }
}

/** Dot product of two float-array columns, accumulated sequentially in
  * double — bit-identical to `aggregate(zip_with(a, b, (x,y) -> double(x)*
  * double(y)), 0d, +)` (and to DuckDB's `list_dot_product` over DOUBLE[]),
  * but a single allocation-free loop instead of two intermediate arrays per
  * row. Null if either array is null, has a null element, or lengths differ.
  */
final case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "fvec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.bothArraysOf(FloatType, left.dataType, right.dataType, prettyName)

  // true codegen (inline loop) so surrounding stages stay whole-stage compiled
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |  else { $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i); }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = va.numElements()
    if (n != vb.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (va.isNullAt(i) || vb.isNullAt(i)) return null
      acc += va.getFloat(i).toDouble * vb.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVectorDot =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH signature of a float-vector column: bit p of the
  * output long = sign of dot(v, plane_p), planes derived deterministically
  * from md5("p|i") mapped to [-1, 1) (≡ the DuckDB oracle's
  * `((md5_number_lower(p || '|' || i) % 2^63) % 2000001 - 1000000) / 1e6`).
  *
  * The plane matrix is a compile-time constant (numPlanes × dim doubles) —
  * tabulated ONCE per task on first row and reused, so signature cost is
  * pure dot products. The previous declarative form rebuilt the md5-derived
  * components inside the row expression: numPlanes × dim digests PER ROW
  * (~1,024 for 16 planes × 64 dims) — ~1000× more hashing than needed.
  * Accumulation order (sequential left-to-right double) and values are
  * bit-identical to that form, so the oracle SQL is unchanged.
  */
final case class HyperplaneSig(child: Expression, numPlanes: Int)
    extends UnaryExpression {
  require(numPlanes > 0 && numPlanes <= 63, "numPlanes in (0, 63]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.arrayOf(FloatType, child.dataType, prettyName, "input")

  // call-out codegen: the loop stays in compiled Scala, the surrounding
  // stage keeps whole-stage codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSig", this, classOf[HyperplaneSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  // per-task cache (expressions are serialized per task, so no cross-thread
  // sharing; a benign race would only redo the 16×dim tabulation)
  @transient private var cachedDim: Int = -1
  @transient private var planes: Array[Double] = _ // flattened [p * dim + i]

  private def planeComponent(p: Int, i: Int): Double =
    (((Md5Hash64.lower(s"$p|$i") & Long.MaxValue) % 2000001L) - 1000000L)
      .toDouble / 1000000.0

  private def planesFor(dim: Int): Array[Double] = {
    if (cachedDim != dim) {
      val m = new Array[Double](numPlanes * dim)
      var p = 0
      while (p < numPlanes) {
        var i = 0
        while (i < dim) { m(p * dim + i) = planeComponent(p, i); i += 1 }
        p += 1
      }
      planes = m
      cachedDim = dim
    }
    planes
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  def compute(vec: ArrayData): Long = {
    val dim = vec.numElements()
    val m = planesFor(dim)
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var i = 0
      val base = p * dim
      while (i < dim) { dot += vec.getFloat(i).toDouble * m(base + i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** Dot product of two double-array columns — the `array<double>` sibling of
  * [[FloatVectorDot]], same sequential accumulation ≡ DuckDB
  * list_dot_product. */
final case class DoubleVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dvec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.bothArraysOf(DoubleType, left.dataType, right.dataType, prettyName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |  else { $acc += $a.getDouble($i) * $b.getDouble($i); }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = va.numElements()
    if (n != vb.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (va.isNullAt(i) || vb.isNullAt(i)) return null
      acc += va.getDouble(i) * vb.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DoubleVectorDot =
    copy(left = l, right = r)
}

/** Literal-matrix × float-vector product → array<double>: one expression
  * computing all `matrix.length` projected components in a single pass,
  * with the matrix held as a reference object (serialized once per task,
  * never per row). Each component is the sequential double fold
  * `Σ_i (double) v[i] · m[j][i]` — bit-identical to
  * `aggregate(zip_with(cast(v), typedlit(m[j]), *), 0d, +)`, the form the
  * DuckDB oracle replays with list_dot_product, but without per-row lambda
  * interpretation or the three intermediate arrays per component.
  * Null if the vector is null, has a null element, or its length differs
  * from the matrix row length. */
final case class MatVec(child: Expression, matrix: Seq[Seq[Double]])
    extends UnaryExpression {
  // Seq (not Array) so case-class equality is by value — Array fields compare
  // by reference and would defeat canonicalization / subexpression elimination
  require(matrix.nonEmpty && matrix.forall(_.length == matrix.head.length),
    "matrix must be non-empty and rectangular")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.arrayOf(FloatType, child.dataType, prettyName, "input")

  // call-out codegen (HyperplaneSig pattern): loop in compiled Scala, the
  // surrounding stage keeps whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVec", this, classOf[MatVec].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
       |  $ref.compute($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  // hot-loop copy of the matrix: rows flattened to a primitive array once
  // per task (the Seq field stays authoritative for equality/serialization)
  @transient private lazy val flat: Array[Double] = matrix.flatten.toArray
  @transient private lazy val nRows: Int = matrix.length
  @transient private lazy val dim: Int = matrix.head.length

  def compute(vec: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (vec.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (vec.isNullAt(i)) return null; i += 1 }
    val m = flat
    val out = new Array[Any](nRows)
    var j = 0
    while (j < nRows) {
      val base = j * dim
      var acc = 0.0
      i = 0
      while (i < dim) { acc += vec.getFloat(i).toDouble * m(base + i); i += 1 }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

/** Argmax row of `matrix · vec` in ONE compiled pass — the kmeans/IVF
  * assignment kernel. Replaces the `array_max(transform(sequence(...),
  * struct(dot, idx)))` shape: a higher-order function is CodegenFallback
  * and evaluates its lambda PER ELEMENT, and CollapseProject will inline
  * a single-reference dots column straight back into the lambda body, so
  * that shape silently re-evaluates the whole [[MatVec]] product once per
  * codebook entry. Tie rule ≡ the struct max: equal dots → the LARGER row
  * index (ascending scan with `>=`), matching the oracle's
  * `ORDER BY sim DESC, cell DESC` rank-1 row. */
final case class MatVecArgMax(child: Expression, matrix: Seq[Seq[Double]])
    extends UnaryExpression {
  require(matrix.nonEmpty && matrix.forall(_.length == matrix.head.length),
    "matrix must be non-empty and rectangular")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "mat_vec_argmax"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.arrayOf(FloatType, child.dataType, prettyName, "input")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mva", this, classOf[MatVecArgMax].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object r = $ref.compute($c);
       |${ev.isNull} = (r == null);
       |if (!${ev.isNull}) ${ev.value} = ((java.lang.Integer) r).intValue();
     """.stripMargin)
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  @transient private lazy val flat: Array[Double] = matrix.flatten.toArray
  @transient private lazy val nRows: Int = matrix.length
  @transient private lazy val dim: Int = matrix.head.length

  def compute(vec: ArrayData): Any = {
    if (vec.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (vec.isNullAt(i)) return null; i += 1 }
    val m = flat
    var best = Double.NegativeInfinity
    var bestJ = 0
    var j = 0
    while (j < nRows) {
      val base = j * dim
      var acc = 0.0
      i = 0
      while (i < dim) { acc += vec.getFloat(i).toDouble * m(base + i); i += 1 }
      if (acc >= best) { best = acc; bestJ = j } // ties -> larger index
      j += 1
    }
    java.lang.Integer.valueOf(bestJ)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecArgMax =
    copy(child = newChild)
}

/** Top-`n` rows of `matrix · vec` by (dot desc, index desc) in one
  * compiled pass — the IVF probe kernel ([[MatVecArgMax]]'s rationale;
  * the tie/order rule ≡ `reverse(array_sort(struct(dot, idx)))`). */
final case class MatVecTopCells(child: Expression, matrix: Seq[Seq[Double]],
                                n: Int) extends UnaryExpression {
  require(matrix.nonEmpty && matrix.forall(_.length == matrix.head.length),
    "matrix must be non-empty and rectangular")
  require(n > 0, "n > 0")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "mat_vec_top_cells"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.arrayOf(FloatType, child.dataType, prettyName, "input")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mvt", this, classOf[MatVecTopCells].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
       |  $ref.compute($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  @transient private lazy val flat: Array[Double] = matrix.flatten.toArray
  @transient private lazy val nRows: Int = matrix.length
  @transient private lazy val dim: Int = matrix.head.length

  def compute(vec: ArrayData): Any = {
    if (vec.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (vec.isNullAt(i)) return null; i += 1 }
    val m = flat
    val dots = new Array[Double](nRows)
    var j = 0
    while (j < nRows) {
      val base = j * dim
      var acc = 0.0
      i = 0
      while (i < dim) { acc += vec.getFloat(i).toDouble * m(base + i); i += 1 }
      dots(j) = acc
      j += 1
    }
    val take = math.min(n, nRows)
    val taken = new Array[Boolean](nRows)
    val out = new Array[Any](take)
    var t = 0
    while (t < take) {
      var best = Double.NegativeInfinity
      var bestJ = -1
      j = 0
      while (j < nRows) {
        // (dot desc, index desc): ascending scan with >= on untaken rows.
        // The seed only sets bestJ (never best), so NaN dots — which fail
        // every comparison — sort LAST and rank 1 stays ≡ MatVecArgMax's
        // result under mixed NaN/finite dots (seeding best=dots(seed)
        // would rank a leading NaN row first and break the probe-leg ≡
        // assignment-leg invariant); an all-NaN row still yields indices
        // instead of faulting at -1.
        if (!taken(j)) {
          if (bestJ < 0) bestJ = j
          if (dots(j) >= best) { best = dots(j); bestJ = j }
        }
        j += 1
      }
      taken(bestJ) = true
      out(t) = bestJ
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecTopCells =
    copy(child = newChild)
}

object VectorExprs {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def dotDouble(a: Column, b: Column): Column =
    ColumnBridge.column(DoubleVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def hyperplaneSig(vec: Column, numPlanes: Int): Column =
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(vec), numPlanes))
  def matVec(vec: Column, matrix: Array[Array[Double]]): Column =
    ColumnBridge.column(MatVec(ColumnBridge.expression(vec),
      matrix.toSeq.map(_.toSeq)))
  def matVecArgMax(vec: Column, matrix: Array[Array[Double]]): Column =
    ColumnBridge.column(MatVecArgMax(ColumnBridge.expression(vec),
      matrix.toSeq.map(_.toSeq)))
  def matVecTopCells(vec: Column, matrix: Array[Array[Double]], n: Int): Column =
    ColumnBridge.column(MatVecTopCells(ColumnBridge.expression(vec),
      matrix.toSeq.map(_.toSeq), n))
}
