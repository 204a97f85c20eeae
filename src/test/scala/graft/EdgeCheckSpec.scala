package graft
import org.apache.spark.sql.functions._
class EdgeCheckSpec extends SparkSpec {
  import spark.implicits._
  test("edge: delete-all, missing-key delete, branch-merge-with-deletes, empty heavy hitters") {
    val st = new graft.engine.SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("edge").toString)
    st.overwrite(Seq((1L,"a"),(2L,"b")).toDF("id","v"), "s","t")
    st.deleteWhere("s","t", Seq("id"), lit(true))
    assert(st.read("s","t").count() == 0)
    st.compact("s","t",1)
    assert(st.read("s","t").count() == 0)
    st.overwrite(Seq((1L,"a")).toDF("id","v"), "s","t2")
    st.deleteKeys(Seq(Tuple1(99L)).toDF("id"), "s","t2", Seq("id"))
    assert(st.read("s","t2").count() == 1)
    st.deleteKeys(Seq(Tuple1(1L)).toDF("id"), "s","t2", Seq("id"))
    st.shallowClone("s","t2","s","t2br")
    st.append(Seq((5L,"e")).toDF("id","v"), "s","t2br")
    st.mergeBranch("s","t2br")
    assert(st.read("s","t2").orderBy("id").select("id").as[Long].collect().toSeq == Seq(5L))
    val hh = graft.ops.Ranking.heavyHitters(Seq.empty[String].toDF("w"), "w", 0.5, 8)
    assert(hh.count() == 0)
  }
}
