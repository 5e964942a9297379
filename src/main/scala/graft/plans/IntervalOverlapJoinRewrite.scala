package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Catalyst optimizer rule: INTERVAL-OVERLAP θ-joins become tile
  * equi-joins automatically — q160's hand decomposition as an engine
  * capability, registered through [[graft.GraftExtensions]].
  *
  * An inner join whose condition conjoins the crisscross pattern
  * `a.start < b.end AND b.start < a.end` (four LongType attribute
  * references, starts/ends in milliseconds) would otherwise plan as a
  * nested-loop/cartesian — O(|L|·|R|) at any scale. The rewrite:
  *
  *  1. each side EXPLODES to the tiles its interval covers
  *     (`sequence(start div T, (end−1) div T)` — `sequence` spans the
  *     closed endpoint range in either direction, so even degenerate
  *     `start ≥ end` rows cover the tiles the proof below needs);
  *  2. the join becomes an EQUI-join on the tile (hash-shuffleable,
  *     AQE-skew-splittable) with the ORIGINAL condition retained as a
  *     verifying post-predicate;
  *  3. the FIRST-TILE guard `tile = greatest(a.start, b.start) div T`
  *     emits each qualifying pair EXACTLY ONCE — both sides' tile sets
  *     contain that tile (for a: `a.start div T ≤ t* ≤ (a.end−1) div T`
  *     follows from `b.start < a.end`, and endpoints are always
  *     emitted; symmetrically for b), and a side emits each tile once,
  *     so multiplicity is preserved with NO distinct;
  *  4. a projection restores the original output (tiles dropped).
  *
  * Null starts/ends agree by construction: the original condition
  * evaluates null → row filtered; here `sequence(null, …)` is null and
  * explode emits nothing. Rows whose interval spans many tiles
  * replicate by span/T — the standard spatial-join trade, tunable via
  * `spark.graft.intervalJoin.tileMs` (default 1 hour).
  *
  * TRIGGERING (round-13 advisory): the default trigger is the EXPLICIT
  * [[graft.functions.IntervalOverlap]] marker predicate — the
  * RANGE_JOIN-hint model: the user names the four roles, so nothing is
  * guessed. Marker-less crisscross AUTO-detection exists but is opt-in
  * via `spark.graft.intervalJoin.autodetect=true`: any inner join with
  * one pair of opposing BIGINT `<` conjuncts matches the pattern, and
  * the matched columns need not be bounded time intervals at all — an
  * SCD-style open end (`valid_to = Long.MaxValue`) or two non-interval
  * long columns would tile a previously working (merely slow) θ-join
  * into a billions-of-elements `sequence` and turn it into a hard
  * runtime failure. Opt-in keeps that blast radius with the operator
  * who chose it.
  *
  * REPLICATION BOUND (same advisory): both paths wrap the tile
  * sequence in a guard — a row whose interval would explode to more
  * than `spark.graft.intervalJoin.maxTilesPerRow` tiles (default
  * 10 000, i.e. >1 year of 1-hour tiles) raises a clear error naming
  * the row's tile count and the two knobs (widen `tileMs`, raise the
  * bound) instead of OOMing the executor inside an anonymous
  * `sequence`. The rule is disabled entirely with
  * `spark.graft.intervalJoin.rewrite=false`.
  */
object IntervalOverlapJoinRewrite extends Rule[LogicalPlan] {

  private val EnableConf = "spark.graft.intervalJoin.rewrite"
  private val AutodetectConf = "spark.graft.intervalJoin.autodetect"
  private val TileConf = "spark.graft.intervalJoin.tileMs"
  private val MaxTilesConf = "spark.graft.intervalJoin.maxTilesPerRow"

  /** Idempotence under fixpoint execution: the Join this rule CREATES
    * carries this tag, so a re-entering batch leaves it alone. A tag —
    * not the old `_graft_tile` attribute-NAME sniff (round-13
    * advisory: a user table with a column named `_graft_tile*`
    * silently disabled the rewrite for its joins). The tile equality
    * the rewrite installs is itself a cross-side equi-key, so even a
    * tag lost to an untagged copy falls through to the equi-key guard
    * below, never to a second tiling.
    */
  private val RewrittenTag = TreeNodeTag[Unit]("graft.intervalJoin.rewritten")

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Match result: the four roles, plus the rewritten condition (for
    * the marker path, the marker is replaced by its plain comparisons
    * so the surviving plan codegens).
    */
  private case class Matched(aS: Attribute, aE: Attribute,
      bS: Attribute, bE: Attribute, newCondition: Expression)

  /** The EXPLICIT marker path first
    * ([[graft.functions.IntervalOverlap]] — the user names the four
    * roles, so there is nothing to guess), then (opt-in) crisscross
    * auto-detection — which must REFUSE ambiguous conditions: with two
    * candidate LessThan pairs a mis-pairing could tile, say, a user-id
    * column against a millisecond column and explode millions of tiles
    * per row. Exactly one valid pairing, or no rewrite.
    */
  private def findOverlap(cond: Expression, conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan,
      autodetect: Boolean): Option[Matched] = {
    def side(a: Attribute): Option[Boolean] =
      if (left.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a)) Some(false)
      else None
    val marker = conjuncts.collectFirst {
      case m @ graft.functions.IntervalOverlap(s1: AttributeReference,
          e1: AttributeReference, s2: AttributeReference,
          e2: AttributeReference)
          if side(s1).isDefined && side(s1) == side(e1) &&
            side(s2).isDefined && side(s2) == side(e2) &&
            side(s1) != side(s2) =>
        val plain = And(LessThan(s1, e2), LessThan(s2, e1))
        val rest = conjuncts.filterNot(_ eq m)
        val newCond = (plain +: rest).reduce(And)
        if (side(s1) == Some(true)) Matched(s1, e1, s2, e2, newCond)
        else Matched(s2, e2, s1, e1, newCond)
    }
    if (marker.isDefined) return marker
    if (!autodetect) return None
    val lts = conjuncts.collect {
      case LessThan(x: AttributeReference, y: AttributeReference)
          if x.dataType == LongType && y.dataType == LongType =>
        (x, y)
      case GreaterThan(y: AttributeReference, x: AttributeReference)
          if x.dataType == LongType && y.dataType == LongType =>
        (x, y)
    }
    val lr = lts.filter {
      case (x, y) => side(x) == Some(true) && side(y) == Some(false)
    }
    val rl = lts.filter {
      case (x, y) => side(x) == Some(false) && side(y) == Some(true)
    }
    val pairings = for {
      (aS, bE) <- lr
      (bS, aE) <- rl
      if Seq(aS, aE, bS, bE).map(_.exprId).distinct.size == 4
    } yield Matched(aS, aE, bS, bE, cond)
    pairings match {
      case Seq(one) => Some(one)
      case _ => None // zero or ambiguous: leave the join alone
    }
  }

  private def tileOf(e: Expression, tileMs: Long): Expression =
    IntegralDivide(e, Literal(tileMs))

  /** The per-row tile list, replication-bounded: spans over `maxTiles`
    * raise a clear, actionable error instead of materializing an
    * arbitrarily long array (Spark's own `sequence` only fails at
    * MAX_ROUNDED_ARRAY_LENGTH — far past the point the executor's
    * memory went to tile replication).
    */
  private def tiles(start: Attribute, end: Attribute, tileMs: Long,
      maxTiles: Long): Expression = {
    val first = tileOf(start, tileMs)
    val last = tileOf(Subtract(end, Literal(1L)), tileMs)
    // Sequence is TimeZoneAwareExpression: built AFTER analysis it must
    // carry its zone explicitly or the plan flips back to unresolved
    val seq = Sequence(first, last, None, Some(conf.sessionLocalTimeZone))
    val span = Add(Subtract(Greatest(Seq(first, last)),
      Least(Seq(first, last))), Literal(1L))
    val err = new RaiseError(Concat(Seq(
      Literal.create("graft interval-overlap rewrite: an interval spans ",
        StringType),
      Cast(span, StringType),
      Literal.create(
        s" tiles (bound $maxTiles). Widen $TileConf or raise " +
          s"$MaxTilesConf; $EnableConf=false disables the rewrite.",
        StringType))))
    If(GreaterThan(span, Literal(maxTiles)),
      Cast(err, ArrayType(LongType, containsNull = false)), seq)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnableConf, "true") != "true") return plan
    val autodetect = conf.getConfString(AutodetectConf, "false") == "true"
    val tileMs = conf.getConfString(TileConf, "3600000").toLong
    val maxTiles = conf.getConfString(MaxTilesConf, "10000").toLong
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.getTagValue(RewrittenTag).isEmpty =>
        val conjuncts = splitConjuncts(cond)
        // an existing cross-side equality already makes this a hash
        // join — tiles would only add fan-out on top of a fine plan.
        // Cast-wrapped and null-safe equalities count (round-13
        // advisory): `cast(a.k as bigint) = b.k` and `a.k <=> b.k`
        // hash-join exactly as well as the bare form.
        def stripCast(e: Expression): Expression = e match {
          case c: Cast => stripCast(c.child)
          case other => other
        }
        def crossSide(x: Expression, y: Expression): Boolean =
          (stripCast(x), stripCast(y)) match {
            case (a: AttributeReference, b: AttributeReference) =>
              (left.outputSet.contains(a) && right.outputSet.contains(b)) ||
                (right.outputSet.contains(a) && left.outputSet.contains(b))
            case _ => false
          }
        val hasEquiKey = conjuncts.exists {
          case EqualTo(x, y) => crossSide(x, y)
          case EqualNullSafe(x, y) => crossSide(x, y)
          case _ => false
        }
        if (hasEquiKey) j
        else findOverlap(cond, conjuncts, left, right, autodetect) match {
          case Some(Matched(aS, aE, bS, bE, keptCond)) =>
            val tileL =
              AttributeReference("_graft_tile_l", LongType, nullable = true)()
            val tileR =
              AttributeReference("_graft_tile_r", LongType, nullable = true)()
            val genL = Generate(Explode(tiles(aS, aE, tileMs, maxTiles)), Nil,
              outer = false, None, Seq(tileL), left)
            val genR = Generate(Explode(tiles(bS, bE, tileMs, maxTiles)), Nil,
              outer = false, None, Seq(tileR), right)
            val firstTile = EqualTo(tileL,
              tileOf(Greatest(Seq(aS, bS)), tileMs))
            val newCond = And(And(EqualTo(tileL, tileR), keptCond), firstTile)
            val rewritten = Join(genL, genR, Inner, Some(newCond), hint)
            rewritten.setTagValue(RewrittenTag, ())
            Project(j.output, rewritten)
          case None => j
        }
    }
  }
}
