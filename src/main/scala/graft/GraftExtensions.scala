package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.VectorFunctions
import graft.plans.NormalizedCosineToDot

/** Session-extension entry point: launch any Spark session with
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * (or `.withExtensions(new GraftExtensions)`) and the engine's custom
  * surface is installed at session creation, for every session cloned from
  * it, with no imperative registration call:
  *
  *  - the codegen'd vector kernels as SQL functions
  *    (`graft_cosine_similarity`, `graft_dot_product`,
  *    `graft_l2_normalize`) — the pure-SQL user's path to the fused-loop
  *    expressions the Column DSL gets from [[graft.functions.VectorFunctions]];
  *  - the [[graft.plans.NormalizedCosineToDot]] optimizer rule, which
  *    strength-reduces cosine-over-normalized-vectors to a dot product.
  *
  * This is the standard Spark mechanism for shipping engine extensions
  * (`SparkSessionExtensions`): the library never needs a fork of Spark,
  * and a cluster operator can enable it fleet-wide through configuration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.descriptions.foreach(ext.injectFunction)
    ext.injectFunction(graft.ops.BloomPrune.description)
    ext.injectOptimizerRule(_ => NormalizedCosineToDot)
  }
}
