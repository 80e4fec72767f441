package graft.tools

import scala.collection.mutable

/** One-time offline BPE trainer: learns the pinned merge table
  * (`src/main/resources/graft/bpe_merges.txt`) that [[graft.functions.Bpe]]
  * and the t30 DuckDB oracle both replay. Classic BPE training (count
  * adjacent token pairs weighted by word frequency, merge the most
  * frequent, repeat), deterministic by construction: ties break on
  * (count desc, left asc, right asc), so re-running on the same corpus
  * reproduces the committed table byte-for-byte.
  *
  *   sbt "runMain graft.tools.LearnBpe /root/testdata/sf0.01 200 src/main/resources/graft/bpe_merges.txt"
  *
  * The driver-side loop is bounded by the DISTINCT pre-token vocabulary
  * (collected as (word, freq) pairs — tens of thousands of rows at any
  * corpus scale worth learning a table from), not the corpus size; the
  * corpus pass itself is a distributed groupBy.
  */
object LearnBpe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: LearnBpe <sfDir> <nMerges> <outFile>")
    val Array(sfDir, nMergesS, outFile) = args
    val nMerges = nMergesS.toInt
    val spark = graft.GraftSession.get("graft-learn-bpe")
    import spark.implicits._

    val vocab: Array[(String, Long)] =
      graft.Tables.documents(spark, sfDir)
        .select("text").as[String]
        .flatMap { t =>
          val toks = graft.functions.Bpe.preTokenize(t)
          (0 until toks.size()).map(i => graft.functions.Bpe.mapWord(toks.get(i)))
        }
        .groupByKey(identity).count()
        .collect()
    println(s"[bpe] distinct pre-token vocabulary: ${vocab.length}")

    // words as token arrays, seeded with single chars
    val words: Array[Array[String]] = vocab.map(_._1.toCharArray.map(_.toString))
    val freqs: Array[Long] = vocab.map(_._2)

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    while (it < nMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      var w = 0
      while (w < words.length) {
        val toks = words(w)
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + freqs(w))
          i += 1
        }
        w += 1
      }
      if (pairCounts.isEmpty) { it = nMerges }
      else {
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        // one left-to-right disjoint sweep per word — the same sweep the
        // tokenizer's replace() formulation performs
        w = 0
        while (w < words.length) {
          val toks = words(w)
          var has = false
          var i = 0
          while (!has && i < toks.length - 1) {
            has = toks(i) == best._1 && toks(i + 1) == best._2; i += 1
          }
          if (has) {
            val out = mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < toks.length) {
              if (i < toks.length - 1 && toks(i) == best._1 && toks(i + 1) == best._2) {
                out += toks(i) + toks(i + 1); i += 2
              } else { out += toks(i); i += 1 }
            }
            words(w) = out.toArray
          }
          w += 1
        }
        it += 1
      }
    }

    val pw = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(outFile), java.nio.charset.StandardCharsets.UTF_8))
    try merges.foreach { case (l, r) => pw.println(l + "\t" + r) }
    finally pw.close()
    println(s"[bpe] wrote ${merges.size} merges to $outFile")
    spark.stop()
  }
}
