package graft.testutil

import java.util.SplittableRandom

import graft.model.CorpusRow

/** Deterministic synthetic corpus with planted duplicate families
  * (FIXTURES.md §2). Seed-stable: same (nDocs, seed) → byte-identical corpus.
  *
  * Families: unique 55%, exact dups 10% (groups 2–20), near dups 20%
  * (1–15% token edits, groups 2–8), contained 8% (A embedded in B),
  * boilerplate 7% (3 shared license headers + short unique tails → hot LSH
  * bands that must NOT produce verified pairs).
  */
object FixtureGen {

  final case class Planted(family: String, groupId: Int)

  /** @return corpus rows plus the planted family label per row index. */
  def corpusWithLabels(nDocs: Int, seed: Long = 42L): (Vector[CorpusRow], Vector[Planted]) = {
    val rnd = new SplittableRandom(seed)
    val vocab = Array.tabulate(512)(i => f"tok$i%03d")
    val langs = Array("scala", "java", "py", "js", "go")
    val langCum = Array(0.40, 0.65, 0.85, 0.95, 1.0)
    val exts = Map("scala" -> "scala", "java" -> "java", "py" -> "py", "js" -> "js", "go" -> "go")

    // One header per ~1500 docs so each header's fingerprint doc-frequency
    // is always well above suffixDfMax (the boilerplate defense) — a header
    // shared by only ~60 docs would legitimately be a contained duplicate.
    val nHeaders = math.max(1, nDocs / 1500)
    val headers: Array[Array[String]] =
      Array.fill(nHeaders)(freshTokens(rnd, vocab, 90 + rnd.nextInt(50)))

    val rows = Vector.newBuilder[CorpusRow]
    val labels = Vector.newBuilder[Planted]
    var id = 0
    var groupId = 0

    def emit(tokens: Array[String], family: String, gid: Int): Unit = {
      val zipf = rnd.nextDouble()
      val repo = f"repo${(zipf * zipf * 40).toInt}%03d"
      val li = pick(rnd, langCum)
      val lang = langs(li)
      val path = s"src/d${id / 100}/f$id.${exts(lang)}"
      val commit = f"${rnd.nextLong()}%016x"
      rows += CorpusRow(repo, path, commit, lang, render(rnd, tokens))
      labels += Planted(family, gid)
      id += 1
    }

    // Draw probabilities are doc-level family fractions divided by expected
    // group size (unique 55% size 1, exact 10% size ~10.5, near 20% size
    // ~4.5, contained 8% size 2, boiler 12% size 12), normalized.
    var boilerRR = 0
    while (id < nDocs) {
      val r = rnd.nextDouble()
      groupId += 1
      if (r < 0.8478) {
        emit(freshTokens(rnd, vocab, docLen(rnd)), "unique", groupId)
      } else if (r < 0.8625) {
        // exact dups: byte-identical content across repos
        val base = freshTokens(rnd, vocab, docLen(rnd))
        val text = render(rnd, base)
        val g = 2 + rnd.nextInt(19)
        var i = 0
        while (i < g && id < nDocs) {
          val zipf = rnd.nextDouble()
          val repo = f"repo${(zipf * zipf * 40).toInt}%03d"
          val li = pick(rnd, langCum)
          val lang = langs(li)
          rows += CorpusRow(repo, s"src/d${id / 100}/f$id.${exts(lang)}", f"${rnd.nextLong()}%016x", lang, text)
          labels += Planted("exact", groupId)
          id += 1
          i += 1
        }
      } else if (r < 0.9309) {
        // near dups: base + 1-15% token edits per copy
        val base = freshTokens(rnd, vocab, docLen(rnd))
        val g = 2 + rnd.nextInt(7)
        emit(base, "near", groupId)
        var i = 1
        while (i < g && id < nDocs) {
          emit(edit(rnd, vocab, base, 0.01 + rnd.nextDouble() * 0.14), "near", groupId)
          i += 1
        }
      } else if (r < 0.9926) {
        // contained: A (>= 60 tokens) embedded verbatim inside bigger B
        val a = freshTokens(rnd, vocab, 60 + rnd.nextInt(240))
        val pre = freshTokens(rnd, vocab, 30 + rnd.nextInt(470))
        val post = freshTokens(rnd, vocab, 30 + rnd.nextInt(470))
        emit(a, "contained", groupId)
        if (id < nDocs) emit(pre ++ a ++ post, "contained", groupId)
      } else {
        // boilerplate: a shared ≥50-token license header + a unique tail
        // long enough that header-driven Jaccard stays below τ. Groups of 25
        // per draw so each header's fingerprints exceed suffixDfMax (the
        // boilerplate defense of the suffix pass) at test scale.
        val hIdx = boilerRR % nHeaders; boilerRR += 1
        val h = headers(hIdx)
        var i = 0
        while (i < 25 && id < nDocs) {
          emit(h ++ freshTokens(rnd, vocab, 150 + rnd.nextInt(150)), "boiler", 1000 + hIdx)
          i += 1
        }
      }
    }
    (rows.result(), labels.result())
  }

  def corpus(nDocs: Int, seed: Long = 42L): Vector[CorpusRow] =
    corpusWithLabels(nDocs, seed)._1

  private def docLen(rnd: SplittableRandom): Int = {
    // log-uniform in [30, 1500]
    val lo = math.log(30.0); val hi = math.log(1500.0)
    math.exp(lo + rnd.nextDouble() * (hi - lo)).toInt.max(30)
  }

  private def freshTokens(rnd: SplittableRandom, vocab: Array[String], n: Int): Array[String] =
    Array.fill(n)(vocab(rnd.nextInt(vocab.length)))

  private def edit(rnd: SplittableRandom, vocab: Array[String], base: Array[String], rate: Double): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](base.length + 8)
    var i = 0
    while (i < base.length) {
      val r = rnd.nextDouble()
      if (r < rate) {
        rnd.nextInt(3) match {
          case 0 => out += vocab(rnd.nextInt(vocab.length)) // substitute
          case 1 => // delete
          case 2 => out += base(i); out += vocab(rnd.nextInt(vocab.length)) // insert
        }
      } else out += base(i)
      i += 1
    }
    out.toArray
  }

  private def pick(rnd: SplittableRandom, cum: Array[Double]): Int = {
    val r = rnd.nextDouble()
    var i = 0
    while (i < cum.length - 1 && r >= cum(i)) i += 1
    i
  }

  /** Render tokens as code-ish text; punctuation is stripped by the
    * tokenizer so it never affects shingles.
    */
  private def render(rnd: SplittableRandom, tokens: Array[String]): String = {
    val sb = new StringBuilder(tokens.length * 8)
    var i = 0
    while (i < tokens.length) {
      sb.append(tokens(i))
      if ((i + 1) % 8 == 0) sb.append(if (rnd.nextInt(4) == 0) ");\n" else "\n")
      else sb.append(if (rnd.nextInt(10) == 0) " = " else " ")
      i += 1
    }
    sb.toString()
  }
}
