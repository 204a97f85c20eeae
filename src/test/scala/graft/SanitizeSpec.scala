package graft

import graft.ops.Sanitize

/** FIXTURES.md §1.5: every branch of transformacao.py:38-67. */
class SanitizeSpec extends SparkSpec {

  test("sanitizeName rule-for-rule") {
    assert(Sanitize.sanitizeName("Data", 0) == "data")
    assert(Sanitize.sanitizeName("Preço Médio", 1) == "preco_medio")
    assert(Sanitize.sanitizeName("Variação %", 2) == "variacao_")
    assert(Sanitize.sanitizeName("Unnamed: 3", 3) == "coluna_extra_3")
    assert(Sanitize.sanitizeName("%", 4) == "coluna_sem_nome_4")
    assert(Sanitize.sanitizeName("9col", 5) == "num_9col")
    assert(Sanitize.sanitizeName(null, 6) == "coluna_sem_nome_6")
    assert(Sanitize.sanitizeName("  spaced  out  ", 7) == "spaced_out")
  }

  test("sanitizeColumns dedupes collisions and renames the frame") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF("Preço", "preço", "PREÇO ")
    val out = Sanitize.sanitizeColumns(df)
    assert(out.columns.toSeq == Seq("preco", "preco_1", "preco_2"))
    assert(out.collect().head.getInt(0) == 1)
  }

  test("output names always match [a-z_][a-z0-9_]*") {
    val weird = Seq("", "   ", "ação!!", "123", "a b c", "Unnamed: 0", "ÀÉÎÕÜ")
    weird.zipWithIndex.foreach { case (w, i) =>
      assert(Sanitize.sanitizeName(w, i).matches("[a-z_][a-z0-9_]*"), s"input '$w'")
    }
  }
}
