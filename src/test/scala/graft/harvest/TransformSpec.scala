package graft.harvest

import graft.SparkSpec
import org.apache.spark.sql.Row

class TransformSpec extends SparkSpec {
  import spark.implicits._

  private def bindings = Seq(
    ("https://v.example/t/1", Some("label one"), Some("alt1a"), Some("def one")),
    ("https://v.example/t/1", Some("label one"), Some("alt1b"), Some("def one")), // fan-out
    ("https://v.example/t/2", None, None, None),                                  // all OPTIONALs unbound
    ("https://v.example/t/3", Some("label three"), None, Some("def three")),
    ("https://v.example/t/3", Some("label three"), None, Some("def three")),      // exact duplicate
    ("ftp://bad.example/t/4", Some("nope"), None, None),                          // invalid scheme
    ("", Some("empty concept"), None, None)                                       // empty key
  ).toDF("concept", "prefLabel", "altLabel", "definition")

  test("filterValidBindings drops empty and non-http concepts (A9/A18)") {
    val v = Transform.filterValidBindings(bindings)
    assert(v.select("concept").distinct().collect().map(_.getString(0)).toSet ===
      Set("https://v.example/t/1", "https://v.example/t/2", "https://v.example/t/3"))
  }

  test("distinctRows removes exact duplicates only (A5)") {
    assert(Transform.distinctRows(bindings).count() === 6)
  }

  test("dedupFirstWins keeps one deterministic row per concept (A10)") {
    val d = Transform.dedupFirstWins(Transform.filterValidBindings(Transform.distinctRows(bindings)))
    assert(d.count() === 3)
    val t1 = d.filter($"concept" === "https://v.example/t/1").head()
    assert(t1.getString(2) === "alt1a") // alt1a < alt1b
  }

  test("melt fans out multi-values, skips nulls, attaches mapping (A14/H5)") {
    val v = Transform.filterValidBindings(Transform.distinctRows(bindings))
    val eav = Transform.meltAll(v).collect()
    // t/1: prefLabel + 2 altLabels + definition = 4; t/2: 0; t/3: pref + def = 2
    assert(eav.length === 6)
    val alt = eav.filter(_.getString(1).endsWith("#altLabel"))
    assert(alt.map(_.getString(3)).toSet === Set("alt1a", "alt1b"))
    assert(eav.forall(_.getString(2).startsWith("skos:")))
  }

  test("melt can bind all seven configured properties (harvest.py:17-25)") {
    val wide = Seq(("https://v.example/t/9", "p", "a", "d", "n", "b", "nw", "r"))
      .toDF("concept", "prefLabel", "altLabel", "definition", "notation", "broader", "narrower", "related")
    val eav = Transform.melt(wide, FieldMappings.mappings.map(_._1))
    assert(eav.count() === 7)
  }
}
