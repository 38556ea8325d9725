package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions._

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works alongside the
  * Column API. Two entry points:
  *
  *  - config-time: `spark.sql.extensions=graft.GraftExtensions`
  *  - runtime: `GraftFunctions.register(spark)` on a live session
  */
object GraftFunctions {

  private object NE {
    def col(e: Expression) = NativeExpressions.col(e)
    // builders run inside the analyzer: conversion must be eager so the
    // resulting Unresolved* nodes get resolved like any parsed SQL
    def expr(c: org.apache.spark.sql.Column): Expression =
      org.apache.spark.sql.GraftColumnBridge.eagerExpression(c)
  }

  /** name → builder over the raw SQL argument expressions. */
  val builders: Map[String, Seq[Expression] => Expression] = Map(
    "graft_cosine" -> (es => CosineSim(es(0), es(1))),
    "graft_dot" -> (es => DotProduct(es(0), es(1))),
    "graft_fingerprint" -> (es => Fingerprint64(es.head)),
    // simhash/minhash take a raw string: tokenization composed in front
    "graft_simhash" -> (es =>
      NE.expr(TextFunctions.simHash(NE.col(es.head)))),
    "graft_minhash" -> (es =>
      NE.expr(graft.operators.Dedup.minHashSignature(NE.col(es.head),
        shingle = 3, numHashes = 32))),
    "graft_tokens" -> (es => NE.expr(TextFunctions.tokens(NE.col(es.head)))),
    // graft_shingles(text, n) — n must be a literal int
    "graft_shingles" -> (es => {
      val n = es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_shingles: n must be an int literal, got $other")
      }
      WordShinglesExpr(NE.expr(TextFunctions.tokens(NE.col(es(0)))), n)
    }),
    "graft_token_count" -> (es =>
      NE.expr(TextFunctions.tokenCount(NE.col(es.head)))),
    "graft_norm" -> (es =>
      NE.expr(graft.functions.VectorFunctions.norm(NE.col(es.head)))),
    "graft_quality" -> (es =>
      NE.expr(TextFunctions.qualityScore(NE.col(es.head)))),
    "graft_langid" -> (es => NE.expr(TextFunctions.langId(NE.col(es.head)))),
    "graft_sanitize" -> (es =>
      NE.expr(graft.functions.Normalize.sanitizeName(NE.col(es.head)))),
    "graft_nfc" -> (es =>
      NE.expr(TextFunctions.nfcNormalize(NE.col(es.head)))))

  /** Register all graft_* functions on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }
}

/** Config-time injection: `--conf spark.sql.extensions=graft.GraftExtensions`.
  * Registers the graft_* SQL functions AND the MERGE/DELETE DML routing
  * over [[graft.catalog.GraftCatalog]] tables (see
  * [[graft.catalog.GraftDml]]; live sessions use `GraftDml.enable`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", null, name, null, "", "", "", "", "", "", "scala_udf"),
        b))
    }
    graft.catalog.GraftDml.install(ext)
  }
}
