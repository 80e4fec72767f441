package graft.tools

/** Offline search for planted byte-string pairs at exact SimHash
  * distances 1..8 (used once to pick the mm06 constants). */
object PlantSearch {
  def main(args: Array[String]): Unit = {
    val pool = (0 until 40000).map(i => s"graft plant payload $i")
    val sigs = pool.map(s =>
      graft.ops.Dedup.binarySimhash(s.getBytes("UTF-8"), 4))
    val want = scala.collection.mutable.Map[Int, (String, String)]()
    var i = 0
    while (i < pool.length && want.size < 8) {
      var j = i + 1
      while (j < math.min(i + 400, pool.length) && want.size < 8) {
        val d = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if (d >= 1 && d <= 8 && !want.contains(d)) want(d) = (pool(i), pool(j))
        j += 1
      }
      i += 1
    }
    want.toSeq.sortBy(_._1).foreach { case (d, (a, b)) =>
      println(s"""[plant] d=$d a="$a" b="$b"""")
    }
  }
}
