package graft.expr

/** Arithmetic expression tree over symbolic variables `x1..xn` with exact
  * evaluation and symbolic partial derivatives.
  *
  * Re-expression of the reference's symbolic-derivative engine used by the
  * delta-method family (see
  * /root/reference/src/udf/starrocks/be/src/exprs/helpers/expr_tree.hpp:33-376):
  * the grammar is numbers, variables, `+ - * /`, parentheses, and unary
  * `+`/`-` (parsed as `0 +/- rhs`). Same operator-precedence shunting-yard
  * construction; partial derivatives follow the usual sum/product/quotient
  * rules.
  */
sealed trait ExprNode {
  def value(x: Array[Double]): Double

  /** Partial derivative wrt variable `idx`, evaluated at `x`. */
  def pd(x: Array[Double], idx: Int): Double
  def dump: String
}

final case class ConstNode(v: Double) extends ExprNode {
  def value(x: Array[Double]): Double = v
  def pd(x: Array[Double], idx: Int): Double = 0.0
  def dump: String = v.toString
}

final case class VarNode(idx: Int) extends ExprNode {
  def value(x: Array[Double]): Double = x(idx)
  def pd(x: Array[Double], i: Int): Double = if (i == idx) 1.0 else 0.0
  def dump: String = s"x${idx + 1}"
}

final case class BinNode(op: Char, l: ExprNode, r: ExprNode) extends ExprNode {
  def value(x: Array[Double]): Double = op match {
    case '+' => l.value(x) + r.value(x)
    case '-' => l.value(x) - r.value(x)
    case '*' => l.value(x) * r.value(x)
    case '/' => l.value(x) / r.value(x)
  }
  def pd(x: Array[Double], i: Int): Double = op match {
    case '+' => l.pd(x, i) + r.pd(x, i)
    case '-' => l.pd(x, i) - r.pd(x, i)
    case '*' => l.pd(x, i) * r.value(x) + l.value(x) * r.pd(x, i)
    case '/' =>
      val rv = r.value(x)
      (l.pd(x, i) * rv - r.pd(x, i) * l.value(x)) / (rv * rv)
  }
  def dump: String = s"(${l.dump} $op ${r.dump})"
}

final class ExprTree private (val root: ExprNode, val variableIndices: Array[Int]) {
  def value(x: Array[Double]): Double = root.value(x)

  /** Gradient restricted to `indices` (defaults to this tree's variables). */
  def gradient(x: Array[Double], indices: Array[Int]): Array[Double] =
    indices.map(root.pd(x, _))
  def gradient(x: Array[Double]): Array[Double] = gradient(x, variableIndices)
  def dump: String = root.dump
}

object ExprTree {
  /** Parse with variables named `x1..xNumVariables` (1-based, like the
    * reference). Throws IllegalArgumentException on malformed input. */
  def apply(expr: String, numVariables: Int): ExprTree = {
    val sym = (1 to numVariables).map(i => s"x$i" -> (i - 1)).toMap
    apply(expr, sym)
  }

  def apply(expr: String, symbolToIdx: Map[String, Int]): ExprTree =
    parse(expr, symbolToIdx).getOrElse(
      throw new IllegalArgumentException(s"cannot parse expression: '$expr'"))

  def parse(inputExpr: String, symbolToIdx: Map[String, Int]): Option[ExprTree] = {
    val prec = Map('(' -> 0, '+' -> 1, '-' -> 1, '*' -> 2, '/' -> 2)
    def isOp(c: Char) = c == '+' || c == '-' || c == '*' || c == '/' || c == '(' || c == ')'
    val expr = ("(" + inputExpr + ")").filterNot(_ == ' ')
    var opStack = List.empty[Char]
    var dataStack = List.empty[ExprNode]
    var varIdx = List.empty[Int]

    def reduceOne(op: Char): Boolean = dataStack match {
      case r :: l :: rest => dataStack = BinNode(op, l, r) :: rest; true
      case _ => false
    }
    def matchLeftBracket(): Boolean = {
      while (opStack.nonEmpty && opStack.head != '(') {
        val op = opStack.head; opStack = opStack.tail
        if (!reduceOne(op)) return false
      }
      if (opStack.isEmpty) false else { opStack = opStack.tail; true }
    }
    def reduceHigher(opNow: Char): Boolean = {
      while (opStack.nonEmpty && prec(opNow) <= prec(opStack.head)) {
        val op = opStack.head; opStack = opStack.tail
        if (op != '(' && !reduceOne(op)) return false
      }
      true
    }

    var l = 0
    val n = expr.length
    while (l < n) {
      val c = expr(l)
      if (c == '(') { opStack = '(' :: opStack; l += 1 }
      else if (c == ')') { if (!matchLeftBracket()) return None; l += 1 }
      else if (c == '+' || c == '-' || c == '*' || c == '/') {
        // unary +/- right after '(' parses as (0 +/- rhs)
        if ((c == '+' || c == '-') && (l == 0 || expr(l - 1) == '(')) {
          dataStack = ConstNode(0.0) :: dataStack
        }
        if (!reduceHigher(c)) return None
        opStack = c :: opStack
        l += 1
      } else {
        var r = l + 1
        while (r < n && !isOp(expr(r))) r += 1
        val symbol = expr.substring(l, r)
        val asNum = parseNumber(symbol)
        if (asNum.isDefined) dataStack = ConstNode(asNum.get) :: dataStack
        else symbolToIdx.get(symbol) match {
          case Some(idx) =>
            dataStack = VarNode(idx) :: dataStack
            varIdx = idx :: varIdx
          case None => return None
        }
        l = r
      }
    }
    if (dataStack.length != 1 || opStack.nonEmpty) None
    else Some(new ExprTree(dataStack.head, varIdx.distinct.sorted.toArray))
  }

  private def parseNumber(s: String): Option[Double] =
    try { Some(java.lang.Double.parseDouble(s)) } catch { case _: NumberFormatException => None }

  /** Extract a symbolic metric expression from a user string written in
    * terms of `avg(col)` sub-aggregates, e.g.
    * `"avg(numerator)/avg(denominator)"` →
    * (`"x1/x2"`, Seq("numerator","denominator")).
    * Mirrors the Python SDK's metric-to-symbol extraction
    * (reference fast_causal_inference/dataframe/statistics.py:26-34).
    * Repeated columns reuse the same symbol. A bare column name with no
    * `avg()` wrapper is treated as `avg(col)`.
    */
  def fromMetricExpr(metric: String): (String, Seq[String]) = {
    val pat = java.util.regex.Pattern.compile("(?:avg|mean)\\s*\\(\\s*([A-Za-z0-9_.]+)\\s*\\)")
    val m = pat.matcher(metric)
    val cols = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val sb = new StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(metric.substring(last, m.start()))
      val idx = cols.getOrElseUpdate(m.group(1), cols.size)
      sb.append(s"x${idx + 1}")
      last = m.end()
    }
    sb.append(metric.substring(last))
    if (cols.isEmpty) ("x1", Seq(metric.trim))
    else (sb.toString, cols.keys.toSeq)
  }
}
