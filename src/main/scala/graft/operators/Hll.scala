package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog — the distinct-counting sibling of the
  * deterministic count-min sketch (CorpusOps.countMinSketch): the
  * published HLL estimator (Flajolet et al. 2007) with md5-derived
  * register updates instead of an engine-private seeded hash, so the
  * whole sketch — registers AND estimate — is reproducible by any
  * engine and fully oracle-bound, unlike the engine-seeded
  * `approx_count_distinct` row (`events_approx_distinct`, rsd
  * spec-bounded but `no_oracle` by nature).
  *
  * Register math is INTEGER-ONLY (hex-nibble scans, no log2 floats):
  * bucket = first `b/4` hex nibbles of md5(value); rho = 1 + leading
  * zero bits of the next-8-nibble 32-bit window (all-zero window →
  * 33). The estimate is then bit-exact across engines by
  * construction: every 2^-rho is an exact f64 power of two and, with
  * rho ≤ 33 and ≤ 2^b ≤ 256 registers, every partial sum spans under
  * 53 mantissa bits — the harmonic sum is EXACT in any addition
  * order, which is what lets one DuckDB expression hash-match a
  * distributed Spark aggregation. (The same argument is why the
  * registers merge losslessly: max per bucket, any grouping.)
  *
  * Memory: 2^b registers per group FOREVER — the sketch's point. At
  * 100 TB a per-source distinct-URL census is 256 bytes of state per
  * source, mergeable by max across partitions, files, or days.
  */
object Hll {

  /** Integer value of one hex nibble of md5 output (the oracle SQL
    * uses an instr() lookup table — different mechanism, same
    * integers). */
  private def nib(h: Column, pos: Int): Column =
    conv(substring(h, pos, 1), 16, 10).cast("int")

  /** Leading-zero bits contributed by nibble value d at the head of
    * the window: 4 for 0, else 3/2/1/0 as the top set bit rises. */
  private def lzOf(d: Column): Column =
    when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).when(d === 1, 3)
      .otherwise(4)

  /** rho = 1 + leading zeros of the 32-bit window at nibbles
    * [start, start+8): a when-chain over the first nonzero nibble —
    * pure integer logic, no floats, engine-identical. */
  private def rho(h: Column, start: Int): Column = {
    val terms = (0 until 8).map { k =>
      val d = nib(h, start + k)
      (d, lit(4 * k) + lzOf(d))
    }
    terms.reverse.foldLeft(lit(33): Column) { case (acc, (d, lz)) =>
      when(d > 0, lz + 1).otherwise(acc)
    }
  }

  private def requireB(b: Int): Unit =
    require(b % 4 == 0 && b > 0 && b <= 8, s"b must be 4 or 8: $b")

  private def bucketOf(h: Column, b: Int): Column = (0 until b / 4)
    .map(i => nib(h, i + 1) * (1 << (4 * (b / 4 - 1 - i))))
    .reduce(_ + _)

  /** The same register math as PURE catalyst trees — the form the SQL
    * function registry needs (`graft_hll_bucket` / `graft_hll_rho` /
    * `graft_hll_est`): a registry builder must return a real catalyst
    * expression, not a DSL Column unwrapped to an opaque column-node
    * wrapper (which survives analysis but cannot codegen). A
    * mechanical translation of the Column forms above; the
    * `sql_hll_distinct` oracle row pins the two bit-identical. */
  private[graft] object Exprs {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

    private def nib(h: Expression, pos: Int): Expression =
      Cast(Conv(Substring(h, Literal(pos), Literal(1)), Literal(16), Literal(10)),
        IntegerType)

    private def lz(d: Expression): Expression = CaseWhen(Seq(
      (GreaterThanOrEqual(d, Literal(8)), Literal(0)),
      (GreaterThanOrEqual(d, Literal(4)), Literal(1)),
      (GreaterThanOrEqual(d, Literal(2)), Literal(2)),
      (EqualTo(d, Literal(1)), Literal(3))), Some(Literal(4)))

    private def rho(h: Expression, start: Int): Expression = {
      val terms = (0 until 8).map { k =>
        val d = nib(h, start + k)
        (d, Add(Literal(4 * k), lz(d)))
      }
      terms.reverse.foldLeft(Literal(33): Expression) { case (acc, (d, lzv)) =>
        CaseWhen(Seq((GreaterThan(d, Literal(0)), Add(lzv, Literal(1)))), Some(acc))
      }
    }

    private def hash(value: Expression): Expression = Md5(Cast(value, StringType))

    def bucket(value: Expression, b: Int): Expression = {
      requireB(b)
      val h = hash(value)
      (0 until b / 4)
        .map(i => Multiply(nib(h, i + 1),
          Literal(1 << (4 * (b / 4 - 1 - i)))): Expression)
        .reduce(Add(_, _))
    }

    def rhoOf(value: Expression, b: Int): Expression = {
      requireB(b)
      rho(hash(value), 1 + b / 4)
    }

    def est(s: Expression, present: Expression, b: Int): Expression = {
      requireB(b)
      val m = (1 << b).toDouble
      def d(x: Double): Expression = Literal(x)
      val zeros = Subtract(d(m), Cast(present, DoubleType))
      val raw = Divide(
        Multiply(Multiply(d(alphaOf(1 << b)), d(m)), d(m)),
        Add(Cast(s, DoubleType), zeros))
      Round(CaseWhen(Seq((
          And(LessThanOrEqual(raw, d(2.5 * m)), GreaterThan(zeros, d(0.0))),
          Multiply(d(m), Log(Divide(d(m), zeros))))),
        Some(raw)), Literal(4))
    }
  }

  /** Per-(group, bucket) registers: max rho per bucket. `b` must be a
    * multiple of 4 (whole hex nibbles), at most 8 (≤ 256 registers —
    * the bit-exactness argument above is sized to this). */
  def registers(df: DataFrame, groupCols: Seq[String], value: Column,
      b: Int = 8): DataFrame = {
    requireB(b)
    val h = md5(value.cast("string"))
    df.select((groupCols.map(col) :+ bucketOf(h, b).as("bucket") :+
        rho(h, 1 + b / 4).as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("r"))
  }

  /** Bias-correction constant per register count, exactly as published
    * (Flajolet et al. 2007, fig. 3): the closed form 0.7213/(1+1.079/m)
    * holds only for m ≥ 128; smaller register counts have their own
    * tabulated constants (alpha_16 = 0.673, alpha_32 = 0.697,
    * alpha_64 = 0.709). With b restricted to {4, 8} only alpha_16 and
    * the closed form are reachable, but the table keeps any future b
    * honest — an oracle recomputing "the published estimator" at m = 16
    * with the closed form would NOT match this engine. */
  private[graft] def alphaOf(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Scalar form of the estimator: `s` = Σ2^-r over PRESENT registers,
    * `present` = their count — also the SQL function
    * `graft_hll_est(s, present, b)`, which makes the whole sketch
    * expressible in raw SQL (build registers with graft_hll_bucket /
    * max(graft_hll_rho), then one grouped call of this). */
  def estCol(s: Column, present: Column, b: Int = 8): Column = {
    requireB(b)
    val m = (1 << b).toDouble
    val alpha = lit(alphaOf(1 << b))
    val zeros = lit(m) - present
    val raw = alpha * lit(m) * lit(m) / (s + zeros)
    round(when(raw <= lit(2.5 * m) && zeros > lit(0.0),
        lit(m) * log(lit(m) / zeros))
      .otherwise(raw), 4)
  }

  /** The HLL estimate from a register table: alpha·m²/Σ2^-r with the
    * published small-range (linear counting) correction; empty
    * registers contribute 2^0 = 1. Exact-arithmetic note: see the
    * object doc — this expression is bit-identical across engines. */
  def estimate(regs: DataFrame, groupCols: Seq[String], b: Int = 8): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("r"))).as("s"),
        count(lit(1)).as("present"))
      .select((groupCols.map(col) :+
        estCol(col("s"), col("present"), b).as("est_distinct")): _*)

  /** registers → estimate in one call. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
      b: Int = 8): DataFrame =
    estimate(registers(df, groupCols, value, b), groupCols, b)
}
