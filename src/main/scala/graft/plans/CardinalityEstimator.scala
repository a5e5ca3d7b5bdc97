package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.operators.{StatsCatalog, StatsMaintain}
import graft.operators.StatsCatalog.ColStats

/** CARDINALITY ESTIMATION from the ANALYZE catalog — the System-R /
  * Selinger estimator (the 1979 formulas every CBO still ships:
  * equality 1/NDV, range by min–max span fraction, equi-join
  * |L|·|R|/max(NDV), group-by NDV product; all public designs),
  * computed over [[StatsCatalog]]'s persisted per-column statistics
  * at PLAN-METADATA cost — no data is scanned. This is the third
  * member of the engine-brain family D77 started: stats ADVISE joins
  * ([[StatsCatalog.adviseJoin]]), PROVE uniqueness for the semantic
  * rewrite ([[JoinEliminationRule]]), and here PREDICT sizes — the
  * number every capacity decision at 100 TB hangs off (shuffle
  * partition counts, broadcast viability of a filtered intermediate,
  * admission control for a query that would materialize 10¹² rows).
  *
  * Deliberately INTEGER-EXACT and deterministic: selectivities are
  * parts-per-million BigInt arithmetic (floor at every step, the
  * q36/q44 fixpoint discipline), so two engines replay the identical
  * estimate — q67's DuckDB oracle recomputes the formulas from the
  * raw tables and the hash gate proves the estimator implements
  * exactly the declared algebra at any scale factor. Estimates are
  * ADVISORY (an estimator is allowed to be wrong about the data;
  * it is not allowed to be nondeterministic about the formula), so
  * approx-mode stats serve too — unlike the uniqueness proof, no
  * exactness license is needed.
  *
  * Estimation algebra (independence and uniformity assumptions,
  * stated once like Selinger did):
  *   - relation → n from the stats catalog (None if un-ANALYZEd:
  *     an estimator that silently guessed table sizes would be
  *     noise, not advice);
  *   - Filter → child × ∏ sel(conjunct), where sel(attr = lit) =
  *     10⁶/ndv, sel(attr IN (k…)) = k·10⁶/ndv, range predicates
  *     take the covered fraction of the integer [min, max] span,
  *     IS NOT NULL takes (n−nulls)/n, anything else the Selinger
  *     default ⅓;
  *   - inner equi-join → |L|·|R| / max(ndv_L(key), ndv_R(key)) (the
  *     containment-of-values assumption); LEFT OUTER additionally
  *     floors at |L| (every left row survives);
  *   - LEFT SEMI → |L| · min(ndv_L, ndv_R) / ndv_L (under
  *     containment, the fraction of left keys that appear on the
  *     right); LEFT ANTI → |L| − semi (the complement, floored at 0);
  *   - Union (ALL) → Σ children; the FIRST branch's attribute stats
  *     stand for the union's distribution (its exprIds are the
  *     union's output ids — a declared uniformity assumption, same
  *     family as Selinger's);
  *   - Aggregate → min(child, ∏ ndv(group cols)); Limit/Sample cap;
  *   - Aggregate over Expand (ROLLUP / CUBE / GROUPING SETS) →
  *     Σ over grouping sets of min(child, ∏ ndv(that set's carried
  *     group attrs)) — each branch of the lattice contributes its
  *     own group count, the grouping-id literal and NULLed slots
  *     contribute factor 1, and a non-empty child floors each
  *     branch at 1 (the all-NULL grand-total row);
  *   - Project/Sort/alias pass through with the attribute
  *     environment rebound (renames keep their column's stats). */
object CardinalityEstimator {

  private val M = BigInt(1000000)

  /** `env` = attribute → single-column stats; `src` = attribute →
    * (dir, table) it traces to — the key for COLUMN-GROUP lookups
    * (the stats' own `column` field carries the original name
    * through renames, so src needs only the table identity). */
  private final case class Est(rows: BigInt, env: Map[ExprId, ColStats],
      src: Map[ExprId, (String, String)])

  /** Estimated output rows of `df`'s analyzed plan, or None when any
    * leaf lacks ANALYZE stats or a shape is outside the algebra.
    *
    * `useColumnGroups = true` additionally consults persisted
    * COLUMN-GROUP stats ([[StatsCatalog.columnGroupIfReady]], D87)
    * for multi-key aggregates whose grouped attributes all trace to
    * one table: the group's measured ndv replaces the independence
    * product (the classic correlated-GROUP-BY overestimate). OPT-IN
    * so existing replayed estimates (q67's oracle) stay stable —
    * an estimator must be deterministic about which algebra it ran,
    * and the flag IS that declaration. */
  /** `useMcv = true` additionally consults persisted MCV lists
    * ([[StatsCatalog.mcvIfReady]], D92) — the SKEW tier: an equality
    * against a most-common value serves its TRUE frequency instead
    * of the uniform 1/ndv, a miss spreads only the remainder mass
    * over the remaining ndv−k values, and an UNFILTERED inner
    * equi-join sums the exact fL·fR products over the common MCV
    * set before estimating the remainder by containment. OPT-IN for
    * the same reason as `useColumnGroups`: the estimator must be
    * deterministic about which algebra it ran, and q67's replayed
    * oracle pins the uniform one (q81 pins this one). */
  /** `useFeedback = true` additionally consults recorded OBSERVED
    * cardinalities ([[graft.operators.CardFeedback]], D96) — the
    * learning tier: any subtree whose exact canonical form ‖ source
    * stamp was observed serves its TRUE count in place of the
    * algebraic estimate (and shapes outside the algebra become
    * estimable when observed). OPT-IN like the other tiers: the
    * estimator declares which algebra it ran; q86 pins this one. */
  def estimateRows(s: SparkSession,
      df: org.apache.spark.sql.DataFrame,
      useColumnGroups: Boolean = false,
      useMcv: Boolean = false,
      useFeedback: Boolean = false): Option[BigInt] =
    // the key-memo scope bounds the feedback tier's per-node stamp
    // walks to one per distinct subtree per EVALUATION — never a
    // wall-clock window (see CardFeedback.withKeyScope)
    graft.operators.CardFeedback.withKeyScope {
      est(s, df.queryExecution.analyzed, useColumnGroups, useMcv,
        useFeedback).map(_.rows)
    }

  /** Shared with the transparent rules: engine-layout roots resolve
    * directly, registered catalog paths through the registry (r15 —
    * catalog tables estimate with their registered table's stats). */
  private def tableOf(rel: LogicalRelation): Option[(String, String)] =
    TableIdentity.of(rel)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: java.lang.Long, _) => Some(v.longValue)
    case Literal(v: java.lang.Integer, _) => Some(v.longValue)
    case Cast(Literal(v: java.lang.Long, _), _, _, _) => Some(v.longValue)
    case Cast(Literal(v: java.lang.Integer, _), _, _, _) => Some(v.longValue)
    case _ => None
  }

  private def attrOf(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case Cast(a: AttributeReference, _, _, _) => Some(a)
    case _ => None
  }

  /** The literal's canonical string rendering — the unit MCV values
    * persist in ([[StatsCatalog.ensureMcv]] casts through
    * StringType). Only the renderings that are bit-stable across
    * both engines qualify (integers, strings); anything else opts
    * out of the MCV branch. */
  private def litStr(e: Expression): Option[String] = e match {
    case Literal(v: java.lang.Long, _) => Some(v.toString)
    case Literal(v: java.lang.Integer, _) => Some(v.toString)
    case Literal(u: org.apache.spark.unsafe.types.UTF8String, _) =>
      Some(u.toString)
    case Cast(inner: Literal, _, _, _) => litStr(inner)
    case _ => None
  }

  /** The attribute's current MCV list, when the MCV tier is on and
    * the artifact is current — resolved through `src` (the table the
    * attribute traces to) and the stats' own column name (survives
    * renames). None fails closed to the uniform formula. */
  private def mcvOf(s: SparkSession, a: AttributeReference,
      env: Map[ExprId, ColStats], src: Map[ExprId, (String, String)],
      mcv: Boolean): Option[Seq[(String, Long)]] =
    if (!mcv) None
    else for {
      (dir, table) <- src.get(a.exprId)
      st <- env.get(a.exprId)
      // the O(batch)-maintained list (D105) serves when the exact
      // artifact went stale under appends — frequencies are lower
      // bounds there, so a hit under-corrects toward uniform, never
      // fabricates skew
      m <- StatsCatalog.mcvIfReady(s, dir, table, st.column)
        .orElse(graft.operators.StatsMaintain
          .mcvMaintIfCurrent(s, dir, table, st.column))
    } yield m

  /** The MCV equality algebra (PostgreSQL's eqsel over
    * most_common_vals — public design), ppm, single floor per step:
    * a literal IN the list serves its true frequency (f·M/n); a miss
    * spreads the remainder mass (n_nonnull − Σf_mcv) uniformly over
    * the remaining ndv − k values — zero when the list already
    * covers the whole domain (ndv ≤ k: a miss is a value that does
    * not exist). */
  private def mcvEqPpm(lit: String, entries: Seq[(String, Long)],
      st: ColStats): BigInt = {
    val n = BigInt(st.n).max(1)
    entries.find(_._1 == lit) match {
      case Some((_, f)) => BigInt(f) * M / n
      case None =>
        val k = entries.size
        if (st.ndv <= k) BigInt(0)
        else {
          val rest = BigInt(st.n - st.nulls) - entries.map(e => BigInt(e._2)).sum
          (rest.max(0) * M / (n * BigInt(st.ndv - k))).min(M)
        }
    }
  }

  /** ppm selectivity of one conjunct under `env`. */
  private def selPpm(c: Expression, env: Map[ExprId, ColStats],
      s: SparkSession,
      src: Map[ExprId, (String, String)],
      mcv: Boolean): BigInt = {
    def ndvPpm(a: AttributeReference, k: Long): Option[BigInt] =
      env.get(a.exprId).filter(_.ndv > 0)
        .map(st => (BigInt(k) * M / st.ndv).min(M))
    // a bound is usable when both stats bounds parse in ONE unit:
    // plain longs, or UTC timestamp renderings as epoch MICROS (the
    // events table's class of predicate — literal micros compare in
    // the same unit, so day-window selectivities come out exact)
    def tsMicros(v: String): Option[Long] = scala.util.Try {
      java.time.LocalDateTime.parse(v.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
    }.toOption.map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L)
    def bound(v: String): Option[Long] =
      scala.util.Try(v.toLong).toOption.orElse(tsMicros(v))
    def span(a: AttributeReference): Option[(Long, Long, ColStats)] =
      env.get(a.exprId).flatMap { st =>
        for {
          mn <- st.min.flatMap(bound)
          mx <- st.max.flatMap(bound)
          if mx >= mn
        } yield (mn, mx, st)
      }
    // covered integer fraction of [mn, mx]; clamped to [0, M]
    def frac(covered: Long, mn: Long, mx: Long): BigInt = {
      val sp = BigInt(mx) - BigInt(mn) + 1
      (BigInt(covered).max(0).min(sp) * M / sp).min(M)
    }
    c match {
      case EqualTo(l, r) =>
        // the MCV tier outranks uniformity when the literal renders
        // canonically AND the attribute has a current MCV artifact;
        // every other leg falls through to Selinger's 1/ndv
        def eq(a: AttributeReference, other: Expression): BigInt =
          (litStr(other), env.get(a.exprId)) match {
            case (Some(ls0), Some(st)) =>
              mcvOf(s, a, env, src, mcv).map(mcvEqPpm(ls0, _, st))
                .getOrElse(ndvPpm(a, 1L).getOrElse(M / 3))
            case _ => ndvPpm(a, 1L).getOrElse(M / 3)
          }
        (attrOf(l), attrOf(r)) match {
          case (Some(a), None) if longLit(r).isDefined || r.isInstanceOf[Literal] =>
            eq(a, r)
          case (None, Some(a)) if longLit(l).isDefined || l.isInstanceOf[Literal] =>
            eq(a, l)
          case _ => M / 3
        }
      case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
        ndvPpm(a, list.length.toLong).getOrElse(M / 3)
      case IsNotNull(a: AttributeReference) =>
        env.get(a.exprId).filter(_.n > 0)
          .map(st => BigInt(st.n - st.nulls) * M / st.n).getOrElse(M)
      case LessThanOrEqual(l, r) =>
        (attrOf(l), longLit(r)) match {
          case (Some(a), Some(k)) =>
            span(a).map { case (mn, mx, _) => frac(k - mn + 1, mn, mx) }
              .getOrElse(M / 3)
          case _ => M / 3
        }
      case LessThan(l, r) =>
        (attrOf(l), longLit(r)) match {
          case (Some(a), Some(k)) =>
            span(a).map { case (mn, mx, _) => frac(k - mn, mn, mx) }
              .getOrElse(M / 3)
          case _ => M / 3
        }
      case GreaterThanOrEqual(l, r) =>
        (attrOf(l), longLit(r)) match {
          case (Some(a), Some(k)) =>
            span(a).map { case (mn, mx, _) => frac(mx - k + 1, mn, mx) }
              .getOrElse(M / 3)
          case _ => M / 3
        }
      case GreaterThan(l, r) =>
        (attrOf(l), longLit(r)) match {
          case (Some(a), Some(k)) =>
            span(a).map { case (mn, mx, _) => frac(mx - k, mn, mx) }
              .getOrElse(M / 3)
          case _ => M / 3
        }
      // disjunction under independence: sel(a OR b) = 1−(1−sa)(1−sb);
      // negation: sel(NOT a) = 1−sa — both Selinger's own forms
      case Or(l, r) =>
        val sl = selPpm(l, env, s, src, mcv)
        val sr = selPpm(r, env, s, src, mcv)
        (M - (M - sl) * (M - sr) / M).min(M).max(0)
      case Not(inner) => (M - selPpm(inner, env, s, src, mcv)).min(M).max(0)
      case _ => M / 3
    }
  }

  /** A side's DISTINCT-row bound: the ndv product over its output
    * when every column has stats (capped at its rows), the raw rows
    * otherwise — the set-op dedup bound. */
  private def distinctBound(plan: LogicalPlan, e: Est): BigInt = {
    val ndvs = plan.output.map(a =>
      e.env.get(a.exprId).map(st => BigInt(st.ndv).max(1)))
    if (ndvs.nonEmpty && ndvs.forall(_.isDefined))
      ndvs.flatten.foldLeft(BigInt(1))(_ * _).min(e.rows)
    else e.rows
  }

  /** Entry point + the FEEDBACK tier: when `fb`, an observed
    * cardinality for this exact canonical subtree overrides the
    * algebraic row count — env/src still come from the algebra so
    * parents keep their attribute stats; a shape the algebra cannot
    * cost becomes estimable when observed. Each node's check costs
    * one (memoized) canonicalization + one FS-metadata stamp walk —
    * plan-time only, no jobs. */
  private def est(s: SparkSession, plan: LogicalPlan,
      groups: Boolean, mcv: Boolean, fb: Boolean = false): Option[Est] = {
    val algebraic = estAlgebra(s, plan, groups, mcv, fb)
    if (!fb) algebraic
    else graft.operators.CardFeedback.observed(s, plan) match {
      case Some(n) =>
        Some(algebraic.map(_.copy(rows = BigInt(n)))
          .getOrElse(Est(BigInt(n), Map.empty, Map.empty)))
      case None => algebraic
    }
  }

  private def estAlgebra(s: SparkSession, plan: LogicalPlan,
      groups: Boolean, mcv: Boolean, fb: Boolean): Option[Est] =
    plan match {
      case rel: LogicalRelation =>
        tableOf(rel).flatMap { case (dir, table) =>
          // statsIfReady, not stats(): an estimator must never build
          // (or upgrade) an artifact — plan-metadata cost only, served
          // by the stamp-keyed memo. When the EXACT catalog is stale
          // (the fingerprint-keyed path re-keys on any append), the
          // MAINTAINED tier (D91) serves instead — approx-grade NDV
          // from the engine's own deterministic HLL, exact n/nulls/
          // min/max — so estimates survive appends without a corpus
          // re-ANALYZE (advice may be approximate; only proofs
          // demand exactness).
          val byNameOpt = StatsCatalog.statsIfReady(s, dir, table)
            .orElse(StatsMaintain.statsIfCurrent(s, dir, table).map(_.map {
              case (c, m) => c -> ColStats(c, m.n, m.nulls,
                m.ndvEst, m.min, m.max, exact = false)
            }))
          byNameOpt.flatMap { byName =>
            val env = rel.output.flatMap(a =>
              byName.get(a.name).map(a.exprId -> _)).toMap
            byName.values.headOption.map(st =>
              Est(BigInt(st.n), env, env.keys.map(_ -> (dir, table)).toMap))
          }
        }
      case Project(list, child) =>
        est(s, child, groups, mcv, fb).map { e =>
          // rebind: bare attrs keep their stats; aliases of bare
          // attrs carry the underlying column's stats to the new id;
          // a NAME-PRESERVING single-source alias (the loader's
          // normalization rebuilds — events' nanos→micros ts) keeps
          // its column's stats too, because the catalog PROFILES the
          // normalized view (graft.Tables), so the stats describe
          // exactly the rebuilt column
          val ids: Seq[(ExprId, ExprId)] = list.flatMap {
            case a: AttributeReference => Some(a.exprId -> a.exprId)
            case al @ Alias(a: AttributeReference, _) =>
              Some(al.exprId -> a.exprId)
            case al: Alias if al.child.references.size == 1 &&
                al.child.references.head.name == al.name =>
              Some(al.exprId -> al.child.references.head.exprId)
            case _ => None
          }
          val rebound = ids.flatMap { case (t, f) =>
            e.env.get(f).map(t -> _) }.toMap
          val reboundSrc = ids.flatMap { case (t, f) =>
            e.src.get(f).map(t -> _) }.toMap
          Est(e.rows, rebound, reboundSrc)
        }
      case SubqueryAlias(_, child) => est(s, child, groups, mcv, fb)
      case Sort(_, _, child, _) => est(s, child, groups, mcv, fb)
      // a window computes columns, never changes cardinality; its new
      // attributes carry no stats, the child's keep theirs
      case Window(_, _, _, child, _) => est(s, child, groups, mcv, fb)
      // DISTINCT / dropDuplicates(keys) is a group-by in disguise:
      // min(child, ∏ ndv(keys)) under the same independence algebra
      case Deduplicate(keys, child) =>
        est(s, child, groups, mcv, fb).map { e =>
          val prod = keys.map {
            case a: AttributeReference =>
              e.env.get(a.exprId).map(st => BigInt(st.ndv).max(1))
                .getOrElse(e.rows)
            case _ => e.rows
          }.foldLeft(BigInt(1))(_ * _)
          Est(prod.min(e.rows).max(if (e.rows > 0) 1 else 0),
            e.env, e.src)
        }
      case Filter(cond, child) =>
        est(s, child, groups, mcv, fb).map { e =>
          val rows = conjuncts(cond).foldLeft(e.rows)(
            (r, c) => r * selPpm(c, e.env, s, e.src, mcv) / M)
          Est(rows, e.env, e.src)
        }
      case Join(l, r, jt, Some(cond), _) if jt == Inner || jt == LeftOuter =>
        for {
          le <- est(s, l, groups, mcv, fb)
          re <- est(s, r, groups, mcv, fb)
          key <- conjuncts(cond).collectFirst {
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if le.env.contains(a.exprId) && re.env.contains(b.exprId) =>
              (a, le.env(a.exprId), b, re.env(b.exprId))
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if le.env.contains(b.exprId) && re.env.contains(a.exprId) =>
              (b, le.env(b.exprId), a, re.env(a.exprId))
          }
        } yield {
          val (la, ls, ra, rs) = key
          // MCV JOIN branch (PostgreSQL's eqjoinsel over
          // most_common_vals, declared-simplified): when BOTH key
          // columns carry current MCV lists AND neither side is
          // filtered below the join (each side's estimate equals its
          // table's row count — MCV frequencies are table-level
          // facts), the common MCV set contributes Σ fL·fR EXACTLY
          // and only the remainder mass estimates by containment
          // over the remaining ndv−|common| values. Any other case
          // (filtered sides, absent/stale artifacts, outer joins)
          // falls through to Selinger's ratio — fail-closed to the
          // q67 algebra, never a guess about scaled frequencies.
          val viaMcv: Option[BigInt] =
            if (!mcv || jt != Inner ||
                le.rows != BigInt(ls.n) || re.rows != BigInt(rs.n)) None
            else for {
              lmv <- mcvOf(s, la, le.env, le.src, mcv)
              rmv <- mcvOf(s, ra, re.env, re.src, mcv)
            } yield {
              val rm = rmv.toMap
              val common = lmv.filter(e => rm.contains(e._1))
              val exact = common.map(e => BigInt(e._2) * BigInt(rm(e._1))).sum
              val restL = (BigInt(ls.n - ls.nulls) -
                common.map(e => BigInt(e._2)).sum).max(0)
              val restR = (BigInt(rs.n - rs.nulls) -
                common.map(e => BigInt(rm(e._1))).sum).max(0)
              val nc = common.size
              val dd = BigInt(math.max(
                math.max(ls.ndv - nc, rs.ndv - nc), 1L))
              exact + restL * restR / dd
            }
          val rows = viaMcv.getOrElse {
            val d = BigInt(math.max(math.max(ls.ndv, rs.ndv), 1L))
            val inner = le.rows * re.rows / d
            if (jt == LeftOuter) inner.max(le.rows) else inner
          }
          Est(rows, le.env ++ re.env, le.src ++ re.src)
        }
      case Join(l, r, jt, Some(cond), _) if jt == LeftSemi || jt == LeftAnti =>
        for {
          le <- est(s, l, groups, mcv, fb)
          re <- est(s, r, groups, mcv, fb)
          key <- conjuncts(cond).collectFirst {
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if le.env.contains(a.exprId) && re.env.contains(b.exprId) =>
              (le.env(a.exprId), re.env(b.exprId))
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if le.env.contains(b.exprId) && re.env.contains(a.exprId) =>
              (le.env(b.exprId), re.env(a.exprId))
          }
        } yield {
          val (ls, rs) = key
          val lnd = BigInt(ls.ndv).max(1)
          val rnd = BigInt(rs.ndv).max(1)
          // containment: the left keys that ALSO occur on the right
          // are min(ndv_L, ndv_R) of ndv_L; uniform rows per key
          val semi = le.rows * lnd.min(rnd) / lnd
          val rows = if (jt == LeftSemi) semi else (le.rows - semi).max(0)
          // only left-side attributes survive a semi/anti join
          Est(rows, le.env, le.src)
        }
      // set ops (DISTINCT variants): declared UPPER BOUNDS — the
      // literature has no principled selectivity without overlap
      // stats, and a capacity decision wants the bound, not a guess.
      // INTERSECT ≤ the smaller distinct side; EXCEPT ≤ the left
      // distinct side (dedup via the left env's ndv product when
      // every column has stats, else the raw side).
      case Intersect(l, r, false) =>
        for { le <- est(s, l, groups, mcv, fb); re <- est(s, r, groups, mcv, fb) } yield
          Est(distinctBound(l, le).min(distinctBound(r, re)),
            le.env, le.src)
      case Except(l, r, false) =>
        // EXCEPT DISTINCT emits at most the left side's DISTINCT rows
        // (r13 review caught the raw-rows shortfall vs the comment)
        est(s, l, groups, mcv, fb).map(e => Est(distinctBound(l, e), e.env, e.src))
      case Union(children, _, _) if children.nonEmpty =>
        val es = children.map(c => est(s, c, groups, mcv, fb))
        if (es.forall(_.isDefined))
          // output exprIds are the head child's — its env is the
          // union's declared distribution (uniformity assumption)
          Some(Est(es.flatten.map(_.rows).sum, es.head.get.env,
            es.head.get.src))
        else None
      case Aggregate(group, _, Expand(projections, expOut, child), _) =>
        est(s, child, groups, mcv, fb).map { e =>
          // Per grouping set: rebind the Expand's output positionally
          // from THAT branch's projection (live slots are attr refs to
          // the group-by aliases, NULLed slots and the grouping-id are
          // literals → no binding → factor 1), then the branch's group
          // count is the Selinger ndv product capped at child rows and
          // floored at 1 on a non-empty child (the grand-total row).
          val floor = if (e.rows > 0) BigInt(1) else BigInt(0)
          val branches = projections.map { proj =>
            val benv = expOut.zip(proj).flatMap {
              case (o, a: AttributeReference) =>
                e.env.get(a.exprId).map(o.exprId -> _)
              case _ => None
            }.toMap
            val prod = group.foldLeft(BigInt(1)) {
              case (acc, a: AttributeReference) =>
                acc * benv.get(a.exprId).map(st => BigInt(st.ndv).max(1))
                  .getOrElse(BigInt(1))
              case (acc, _) => acc
            }
            prod.min(e.rows).max(floor)
          }
          Est(branches.sum, Map.empty, Map.empty)
        }
      case Aggregate(group, _, child, _) =>
        est(s, child, groups, mcv, fb).map { e =>
          // COLUMN-GROUP path (opt-in): when every grouped attribute
          // traces to ONE table and a persisted group artifact covers
          // exactly that column set, its measured tuple-NDV replaces
          // the independence product — the correlated-GROUP-BY fix
          val attrs = group.collect { case a: AttributeReference => a }
          val grouped: Option[BigInt] =
            if (!groups || attrs.size != group.size || attrs.size < 2) None
            else {
              val srcs = attrs.flatMap(a => e.src.get(a.exprId)).distinct
              val names = attrs.flatMap(a => e.env.get(a.exprId).map(_.column))
              if (srcs.size == 1 && names.size == attrs.size)
                StatsCatalog.columnGroupIfReady(s, srcs.head._1,
                  srcs.head._2, names)
                  // MAINTAINED tier (D94): when the exact group went
                  // stale under appends, the HLL-maintained tuple-NDV
                  // serves — an ESTIMATE is advisory by contract, so
                  // approx-grade is admissible here (and only here:
                  // the FD proof face never reads this tier)
                  .orElse(graft.operators.StatsMaintain
                    .columnGroupApproxIfCurrent(s, srcs.head._1,
                      srcs.head._2, names))
                  .map(g => BigInt(g.ndv).max(1))
              else None
            }
          val prod = grouped.getOrElse {
            group.map {
              case a: AttributeReference =>
                e.env.get(a.exprId).map(st => BigInt(st.ndv).max(1))
                  .getOrElse(e.rows)
              case _ => e.rows
            }.foldLeft(BigInt(1))(_ * _)
          }
          Est(prod.min(e.rows).max(if (e.rows > 0) 1 else 0),
            Map.empty, Map.empty)
        }
      case GlobalLimit(IntegerLiteral(k), child) =>
        est(s, child, groups, mcv, fb).map(e => Est(e.rows.min(BigInt(k)), e.env, e.src))
      case LocalLimit(IntegerLiteral(k), child) =>
        est(s, child, groups, mcv, fb).map(e => Est(e.rows.min(BigInt(k)), e.env, e.src))
      case _ => None
    }
}
