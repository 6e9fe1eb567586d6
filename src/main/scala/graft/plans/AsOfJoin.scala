package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeSet, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.GraftShim

/** Native as-of join — the whole-operator extension path (SURVEY §2-C/c10):
  * a custom LogicalPlan + Strategy + SparkPlan registered through
  * SparkSessionExtensions / experimental.extraStrategies.
  *
  * Spark has no built-in ASOF JOIN (the reference sync loop's "apply the
  * newest state at-or-before each change" lookup; DuckDB spells it
  * ASOF JOIN). It CAN be composed from union+window (ops.SyncOps.c10), but
  * as a first-class operator the engine plans it like a sort-merge join:
  * both sides hash-clustered on the equi-keys and sorted by (keys, ts), then
  * a single forward merge per partition emits, for every left row, the
  * latest right row with right.ts <= left.ts. One shuffle per side, O(1)
  * state per key, no candidate-pair blow-up — the shape that survives
  * 1000 executors, and the plan shows it (AsOfJoinExec over two sorted
  * exchanges, no BNLJ).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical inner as-of join: merge of two (keys, ts)-sorted streams. */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // Same contract as SortMergeJoin: co-clustered children, each sorted by
  // (equi-keys, ts) — EnsureRequirements inserts compatible hash exchanges.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    // Right side gets a secondary sort over its remaining orderable columns:
    // among several right rows sharing the max qualifying (key, ts) the merge
    // keeps the LAST one, and without a total order that pick would be
    // whatever the shuffle happened to deliver — nondeterministic across
    // runs/partitionings. The tiebreak makes THIS engine's pick stable (the
    // row maximal in that column order); other engines' ASOF tie rules
    // remain implementation-defined, so an oracle comparison with duplicate
    // right (key, ts) rows still requires deduping the right side first.
    // (Non-orderable columns — maps — can't participate; rows differing
    // only there remain tied, documented on AsOf.join.)
    val keyAndTs = AttributeSet(rightKeys :+ rightTs)
    val tiebreak = right.output
      .filterNot(keyAndTs.contains)
      .filter(a => RowOrdering.isOrderable(a.dataType))
      .map(SortOrder(_, Ascending))
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
      (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending)) ++ tiebreak)
  }
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        private var curKey: UnsafeRow = _   // copy of the current left key
        private var cand: InternalRow = _   // latest right row with ts <= left ts
        private var pending: InternalRow = _

        private def advance(): Unit = {
          pending = null
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l)
            if (curKey == null || keyOrd.compare(lk, curKey) != 0) {
              curKey = lk.copy()
              cand = null
            }
            // left rows arrive ts-ascending within a key, so the right
            // cursor only ever moves forward: consume right rows that are
            // behind the current key, or at the key with ts <= left ts
            // (each one supersedes the previous candidate).
            val lt = lTsProj(l).copy()
            var stop = false
            while (!stop && rBuf.hasNext) {
              val r = rBuf.head
              val c = keyOrd.compare(rKeyProj(r), curKey)
              if (c < 0) rBuf.next()
              else if (c == 0 && tsOrd.compare(rTsProj(r), lt) <= 0)
                cand = rBuf.next().copy()
              else stop = true
            }
            if (cand != null) pending = resultProj(joined(l, cand))
          }
        }

        // Lazy advance: resultProj reuses its output buffer, so the next
        // row may only be computed AFTER the consumer is done with the
        // previous one (volcano contract: a row is valid until the next
        // hasNext/next call). Advancing eagerly inside next() would
        // overwrite the row being returned.
        private var exhausted = false
        override def hasNext: Boolean = {
          if (pending == null && !exhausted) {
            advance()
            if (pending == null) exhausted = true
          }
          pending != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val out = pending
          pending = null
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Column pruning through [[AsOfJoinPlan]]: Catalyst's own pruning stops at
  * nodes it doesn't know, so `AsOf.join(wide, wide, …).select(few)` would
  * read every column off disk. This rule pushes a Project onto each child
  * keeping only the columns the parent references plus the join keys/ts —
  * at 100 TB the difference between scanning 2 columns and scanning 40. */
object AsOfJoinPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projList, aj: AsOfJoinPlan) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(aj.leftKeys ++ aj.rightKeys :+ aj.leftTs :+ aj.rightTs)
      val lKeep = aj.left.output.filter(needed.contains)
      val rKeep = aj.right.output.filter(needed.contains)
      if (lKeep.length < aj.left.output.length ||
          rKeep.length < aj.right.output.length)
        Project(projList, aj.copy(
          left = Project(lKeep, aj.left), right = Project(rKeep, aj.right)))
      else p
  }
}

/** The engine's single entry point for `spark.sql.extensions`: planner
  * strategy + optimizer rule (as-of join) and the codegen'd SQL functions
  * (vec_dot). Set at session build, or use [[GraftPlans.install]] on an
  * existing session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfJoinPruning)
    new graft.functions.VectorExpressions.GraftExtensions()(ext)
  }
}

object GraftPlans {
  /** Idempotently add the graft strategies + rules to a built session. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(AsOfJoinPruning))
      spark.experimental.extraOptimizations = opts :+ AsOfJoinPruning
  }
}

/** User-facing API: `AsOf.join(purchases, views, Seq("user_id"), "p_ts",
  * "v_ts")` → every left row paired with the latest right row at-or-before
  * it (inner). Key/ts columns are resolved by name against each side.
  *
  * Note: the right side's attributes are re-aliased internally (fresh
  * exprIds, required for self-joins), so refer to right-side columns of
  * the result BY NAME (`col("rv")`), not via the input frame
  * (`rightDf("rv")` won't resolve) — the same rule as after a plain
  * self-join dedup.
  *
  * Ties: when several right rows share the same (key, ts), the one maximal
  * in the ascending order of the right side's remaining orderable columns
  * wins (deterministic). Rows identical on every orderable column but
  * differing in a non-orderable one (e.g. a map) remain unordered. */
object AsOf {
  def join(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTsCol: String, rightTsCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = left.sparkSession
    GraftPlans.install(spark)
    // SQL comparison semantics: a NULL key never equals anything and a
    // NULL ts never satisfies <=, but the merge's natural row ordering
    // would happily compare NULLs — drop them at the boundary (same rows
    // an equi-join + ts predicate would drop).
    def dropNulls(df: DataFrame, cols: Seq[String]) =
      cols.foldLeft(df)((d, c) => d.filter(col(c).isNotNull))
    val lPlan = dropNulls(left, on :+ leftTsCol).queryExecution.analyzed
    val rAnalyzed = dropNulls(right, on :+ rightTsCol).queryExecution.analyzed
    // Fresh exprIds on the right so self-joins (both sides reading the same
    // source) carry no ambiguous attributes — the analyzer normally does
    // this dedup for Join nodes; a hand-built plan must do it itself.
    val aliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(aliases, rAnalyzed)
    val rOut = aliases.map(_.toAttribute)
    // resolve with the session's name resolver (case-insensitive under the
    // default spark.sql.caseSensitive=false), matching how every built-in
    // join resolves `Seq("User_ID")`-style keys
    val resolver = spark.sessionState.analyzer.resolver
    def resolve(out: Seq[Attribute], n: String): Attribute =
      out.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"asof column '$n' not in [${out.map(_.name).mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"asof column '$n' is ambiguous: [${many.map(_.name).mkString(", ")}]")
      }
    val (lk, rk) = (on.map(resolve(lPlan.output, _)), on.map(resolve(rOut, _)))
    val (lt, rt) = (resolve(lPlan.output, leftTsCol), resolve(rOut, rightTsCol))
    // The exec compares raw UnsafeRows through orderings built from the
    // LEFT types — a type mismatch would read the wrong bytes and return
    // silently wrong rows (the analyzer inserts casts for Join nodes; a
    // hand-built plan must enforce this itself).
    (lk.zip(rk) :+ (lt, rt)).foreach { case (a, b) =>
      require(org.apache.spark.sql.types.DataType.equalsStructurally(
        a.dataType, b.dataType, ignoreNullability = true),
        s"asof column type mismatch: ${a.name}: ${a.dataType.simpleString} " +
          s"vs ${b.name}: ${b.dataType.simpleString} — cast the inputs first")
    }
    GraftShim.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt))
  }
}
