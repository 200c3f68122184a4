package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.typedlit
import org.apache.spark.sql.graft.CosineSimilarity
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.index.IvfIndex
import graft.search.Ann

/** Optimizer rule rewriting brute-force ANN onto the persisted IVF index
  * (SURVEY O4c): a plan of the shape
  *
  *   ORDER BY round(cosine_sim(embedding, <literal qvec>), 6) DESC [, id]
  *   LIMIT k
  *
  * over a parquet scan tagged `option("graft.ivf.source", dir)` is
  * replaced by [[Ann.ivfTopKAssigned]] over the registered index — the
  * declarative query stays brute-force-shaped, the physical execution
  * probes `nprobe` centroid partitions. Mirrors Qdrant serving `search()`
  * from HNSW once an index exists (`scripts/indexing.py:326-340`) with the
  * same `full_scan_threshold` escape hatch: relations smaller than the
  * threshold keep the exact scan, where brute force wins.
  *
  * The rewrite fires only when ALL of:
  *  - the scan carries the opt-in option AND its dir has a registered
  *    index ([[IvfIndex.lookup]]) — exact-path queries are never silently
  *    made approximate;
  *  - the sort's primary key is DESC on a projected
  *    `round(cosine_sim(vectorColumn, literal), 6)`;
  *  - the relation is at least `fullScanThresholdBytes`.
  *
  * Output attributes keep the original exprIds (re-aliased on top of the
  * replacement subtree), so parent operators are untouched.
  */
class IvfAnnRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl: GlobalLimit => tryRewrite(gl).getOrElse(gl)
  }

  private def tryRewrite(gl: GlobalLimit): Option[LogicalPlan] = {
    for {
      k <- gl.maxRows.map(_.toInt).orElse(literalInt(gl.limitExpr))
      ll <- Some(gl.child).collect { case l: LocalLimit => l }
      sort <- Some(ll.child).collect { case s: Sort if s.global => s }
      project <- Some(sort.child).collect { case p: Project => p }
      rel <- Some(project.child).collect { case r: LogicalRelation => r }
      fsRel <- Some(rel.relation).collect { case f: HadoopFsRelation => f }
      sourceKey <- fsRel.options.get(IvfIndex.SourceOption)
      info <- IvfIndex.lookup(sourceKey)
      if rel.stats.sizeInBytes >= info.fullScanThresholdBytes
      // the projection must be EXACTLY (id, score) — any extra projected
      // column would vanish from the replacement's output (the index only
      // stores id + vector), silently changing the query's schema
      if project.projectList.size == 2
      // the projected score: Alias over round(cosine_sim(attr, literal), 6)
      // — the replacement computes round(...,6), so only that exact
      // rounding may be served from the index
      scoreAlias <- project.projectList.collectFirst {
        case a: Alias if cosineOf(a.child).isDefined => a
      }
      cos <- cosineOf(scoreAlias.child)
      qvec <- literalFloatArray(cos.right)
      // the cosine's vector argument must be the relation's INDEXED vector
      // column — a cosine over any other array column cannot be served
      // from this index
      vecAttr <- Some(cos.left).collect { case ar: AttributeReference => ar }
      if vecAttr.name == info.vecCol && rel.outputSet.contains(vecAttr)
      // the id projection must resolve to the relation's indexed id column
      // (by underlying attribute, not output name — a projected `label`
      // would otherwise be silently served index vec_ids)
      idPair <- project.projectList.collectFirst {
        case a: Alias if a.child.isInstanceOf[AttributeReference] &&
          cosineOf(a.child).isEmpty =>
          (a.toAttribute, a.child.asInstanceOf[AttributeReference])
        case ar: AttributeReference => (ar, ar)
      }
      (idAttr, idSource) = idPair
      if idSource.name == info.idCol && rel.outputSet.contains(idSource)
      // sort must be BARE score DESC with at most a BARE `id ASC`
      // tie-break — semantic equality, not reference-set equality, so an
      // expression OVER the score (e.g. `-score DESC`) never matches: the
      // replacement orders (score desc, id asc) and any other order would
      // cut the LIMIT on different rows
      firstOrder <- sort.order.headOption
      if firstOrder.direction == Descending &&
        firstOrder.child.semanticEquals(scoreAlias.toAttribute)
      if sort.order.size <= 2
      if sort.order.size < 2 || {
        val o = sort.order(1)
        o.direction == Ascending && o.child.semanticEquals(idAttr)
      }
    } yield {
      val assigned = spark.read.parquet(info.assignedPath)
      val centroids = spark.read.parquet(info.centroidsPath)
      val qdf = spark.range(1).select(typedlit(qvec).as("qvec"))
      val replacement = Ann
        .ivfTopKAssigned(assigned, centroids, qdf, info.nprobe, k)
        .queryExecution.optimizedPlan
      val Seq(repId, repScore) = replacement.output
      logInfo(s"IVF rewrite fired: k=$k nprobe=${info.nprobe} " +
        s"index=${info.assignedPath}")
      Project(Seq(
        Alias(repId, idAttr.name)(exprId = idAttr.exprId),
        Alias(repScore, scoreAlias.name)(exprId = scoreAlias.exprId)),
        replacement)
    }
  }

  private def literalInt(e: Expression): Option[Int] = e match {
    case Literal(v: Int, _) => Some(v)
    case _ => None
  }

  /** Match `round(cosine_sim(vector, literal), 6)` (or the bare cosine) —
    * ONLY scale 6, because the replacement plan scores at 6dp; serving a
    * round(...,2) query from the index would change the values and the
    * tie-grouping the query asked for. */
  private def cosineOf(e: Expression): Option[CosineSimilarity] = e match {
    case c: CosineSimilarity => Some(c)
    case Round(child, Literal(6, _), _) => cosineOf(child)
    case _ => None
  }

  private def literalFloatArray(e: Expression): Option[Array[Float]] = e match {
    case Literal(v: ArrayData, ArrayType(FloatType, _)) => Some(v.toFloatArray)
    case _ => None
  }
}
