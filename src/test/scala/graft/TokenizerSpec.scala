package graft

import graft.text.Tokenizer
import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {
  import Tokenizer.{DemoVocab, tokenize, wordPieces}

  test("greedy longest-match picks the longest piece at each cursor") {
    assert(wordPieces("customer") == List("cust", "##omer"))
    assert(wordPieces("column") == List("col", "##umn"))
    assert(wordPieces("filter") == List("fil", "##ter"))
    assert(wordPieces("vector") == List("vec", "##tor"))
    assert(wordPieces("stream") == List("str", "##eam"))
    assert(wordPieces("window") == List("win", "##dow"))
    assert(wordPieces("table") == List("table"))
    assert(wordPieces("a") == List("a"))
  }

  test("out-of-vocab words fall back to single characters, never [UNK] for [a-z0-9]") {
    assert(wordPieces("xq7") == List("x", "##q", "##7"))
    // every [a-z0-9]+ word segments without UNK (single chars in vocab)
    assert(!wordPieces("zzzyx42").contains(Tokenizer.Unk))
  }

  test("[UNK] consumes the rest of the word when no piece matches") {
    val v = Tokenizer.Vocab(Seq("ab", "##c"))
    assert(wordPieces("abcx", v) == List("ab", "##c", Tokenizer.Unk))
    assert(wordPieces("zab", v) == List(Tokenizer.Unk))
  }

  test("tokenize: lowercases, splits on non-alphanumerics, null/empty-safe") {
    assert(tokenize("Customer JOIN, window!").toSeq ==
      Seq("cust", "##omer", "join", "win", "##dow"))
    assert(tokenize(null).isEmpty)
    assert(tokenize("  ,;  ").isEmpty)
  }

  test("oracle CTE emission contains every vocab piece list") {
    val sql = Tokenizer.oracleSegCtes(DemoVocab)
    assert(sql.contains("'cust'") && sql.contains("'omer'"))
    assert(sql.contains("regexp_extract_all(lower(text),'[a-z0-9]+')"))
    // longest-first: the len-5 probe must appear before the len-4 probe
    assert(sql.indexOf("substr(word,pos,5)") < sql.indexOf("substr(word,pos,4)"))
  }
}
