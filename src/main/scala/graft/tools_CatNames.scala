package graft
/** Dev check: catalog size vs queries-map size (a name collision
  * silently drops a catalog entry from the bench). */
object CatNames {
  def main(args: Array[String]): Unit = {
    val cat = SparkEntry.catalog.map(_.name)
    val dup = cat.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    println(s"catalog=${cat.size} map=${SparkEntry.queries.size} dups=$dup")
  }
}
