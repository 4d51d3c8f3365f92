package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PlanLiterals
import graft.operators.Similarity
import graft.text.Analysis

/** The plan-literal model ceilings are a CONTRACT (round-6 advice):
  * folding a driver-side model into the plan is only sane up to a
  * bounded size; above it the caller must switch to a broadcast-join
  * form. These tests exercise the boundary from both sides.
  */
class PlanLiteralsSpec extends AnyFunSuite {

  test("randomPlanes / rademacherSigns refuse above-ceiling literal models") {
    intercept[IllegalArgumentException] {
      Similarity.randomPlanes(numPlanes = 2048, dim = 1024) // 2M doubles
    }
    intercept[IllegalArgumentException] {
      Similarity.rademacherSigns(outDim = 2048, inDim = 1024)
    }
    // exactly at the ceiling is allowed
    assert(Similarity.rademacherSigns(1024, 1024).length == 1024)
  }

  test("centroid and codebook folding refuse above-ceiling models") {
    val big = Array.fill(17000)(Array.fill(64)(0.0)) // 1.04M doubles
    intercept[IllegalArgumentException] {
      Similarity.nearestCells(lit(null).cast("array<double>"), big, 1)
    }
    intercept[IllegalArgumentException] {
      // 64 subspaces x 1025 centroids x 16 dims — one centroid past 2^20
      Similarity.pqEncode(lit(null).cast("array<double>"),
        Array.fill(64)(Array.fill(1025)(Array.fill(16)(0.0))))
    }
  }

  test("unigram literal map refuses above-ceiling vocabularies") {
    val okModel = Map("a" -> -1.0)
    assert(Analysis.unigramAvgLogProb(lit(null).cast("array<string>"),
      okModel, -5.0) != null)
    val big = (0 to PlanLiterals.MaxMapTerms)
      .map(i => s"w$i" -> -1.0).toMap
    intercept[IllegalArgumentException] {
      Analysis.unigramAvgLogProb(lit(null).cast("array<string>"),
        big, -5.0)
    }
  }
}
