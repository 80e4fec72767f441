package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, GetStructField, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{BatchEntry, MarcExtractBatch, MarcExtractExpression, XPathExtractBatch, XPathExtractExpression}

/** Auto-fusion of repeated `marc_extract` calls — the reference's SpecSet
  * idea (/root/reference/lib/traject/marc_extractor_spec.rb:13-68) lifted
  * into a Catalyst optimizer rule.
  *
  * A config written naively as N independent `marcExtract(spec)` columns
  * over the same record walks the fields array N times per record. This
  * rule finds every Project with ≥2 distinct extraction specs over the
  * same record expression and rewrites them into ONE
  * [[MarcExtractBatch]] (single fields traversal) materialized in an
  * inner Project, with each original call becoming a struct-field
  * reference. The manual `MarcExtractBatch` API remains for explicit use;
  * with this rule the naive spelling gets the same plan automatically
  * (asserted by PlanShapeSpec).
  */
object FuseMarcExtracts extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, child) =>
      val marcFusable = projectList
        .flatMap(_.collect { case m: MarcExtractExpression => m })
        .groupBy(_.child.canonicalized)
        .filter { case (_, ms) =>
          ms.map(m => (m.specString, m.separator, m.alternateScript)).distinct.size >= 2
        }
      val xpathFusable = projectList
        .flatMap(_.collect { case x: XPathExtractExpression => x })
        .groupBy(x => (x.child.canonicalized, x.namespaces))
        .filter { case (_, xs) => xs.map(x => (x.xpath, x.toText)).distinct.size >= 2 }

      if (marcFusable.isEmpty && xpathFusable.isEmpty) p
      else {
        var innerExtra = Vector.empty[NamedExpression]
        var rewritten: Seq[NamedExpression] = projectList

        marcFusable.foreach { case (recKey, ms) =>
          val recChild: Expression = ms.head.child
          val variants = ms.map(m => (m.specString, m.separator, m.alternateScript)).distinct
          val entries = variants.zipWithIndex.map { case ((spec, sep, alt), i) =>
            BatchEntry(s"e$i", spec, sep, alt)
          }
          val index = variants.zipWithIndex.toMap
          val batchAlias = Alias(MarcExtractBatch(recChild, entries), "_marc_extract_fused")()
          innerExtra :+= batchAlias
          val batchRef = batchAlias.toAttribute
          rewritten = rewritten.map(_.transform {
            case m: MarcExtractExpression if m.child.canonicalized == recKey =>
              val i = index((m.specString, m.separator, m.alternateScript))
              GetStructField(batchRef, i, Some(s"e$i"))
          }.asInstanceOf[NamedExpression])
        }

        xpathFusable.foreach { case (key @ (childKey, ns), xs) =>
          val xmlChild: Expression = xs.head.child
          val variants = xs.map(x => (x.xpath, x.toText)).distinct
          val index = variants.zipWithIndex.toMap
          val batchAlias = Alias(XPathExtractBatch(xmlChild, variants, ns), "_xpath_fused")()
          innerExtra :+= batchAlias
          val batchRef = batchAlias.toAttribute
          rewritten = rewritten.map(_.transform {
            case x: XPathExtractExpression
                if x.child.canonicalized == childKey && x.namespaces == ns =>
              val i = index((x.xpath, x.toText))
              GetStructField(batchRef, i, Some(s"x$i"))
          }.asInstanceOf[NamedExpression])
        }

        Project(rewritten, Project(child.output ++ innerExtra, child))
      }
  }
}

/** `SparkSessionExtensions` hook: registers the fusion rule.
  * Install via GraftSession (all graft sessions) or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseMarcExtracts)
    GraftSqlFunctions.register(ext)
  }
}
