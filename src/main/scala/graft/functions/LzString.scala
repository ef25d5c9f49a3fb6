package graft.functions

import scala.collection.mutable

/**
 * Scala port of the public-domain lz-string algorithm (pieroxy/lz-string,
 * MIT) — UTF-16-safe variant only, which is the transport codec the
 * reference's `study` plugin uses for list-page payloads
 * (plugins/study/src/lib.rs:23-33: decompress `<textarea id=model>` content
 * and POST bodies). Pure function -> safe inside codegen'd expressions.
 */
object LzString {

  /** compressToUTF16: 15 bits per output char, offset +32, trailing space. */
  def compressToUtf16(input: String): String = {
    if (input == null) return null
    compress(input, 15, a => (a + 32).toChar) + " "
  }

  /** decompressFromUTF16 — inverse of [[compressToUtf16]]. */
  def decompressFromUtf16(compressed: String): String = {
    if (compressed == null) return null
    if (compressed.isEmpty) return ""
    decompress(compressed.length, 16384, i => compressed.charAt(i) - 32)
  }

  private def compress(uncompressed: String, bitsPerChar: Int, getCharFromInt: Int => Char): String = {
    val dictionary = mutable.HashMap.empty[String, Int]
    val dictionaryToCreate = mutable.HashSet.empty[String]
    var w = ""
    var enlargeIn = 2
    var dictSize = 3
    var numBits = 2
    val data = new StringBuilder
    var dataVal = 0
    var dataPosition = 0

    def writeBit(bit: Int): Unit = {
      dataVal = (dataVal << 1) | bit
      if (dataPosition == bitsPerChar - 1) {
        dataPosition = 0
        data.append(getCharFromInt(dataVal))
        dataVal = 0
      } else dataPosition += 1
    }
    def writeBits(numBitsToWrite: Int, v: Int): Unit = {
      var value = v
      var i = 0
      while (i < numBitsToWrite) {
        writeBit(value & 1)
        value >>= 1
        i += 1
      }
    }
    def produceW(): Unit = {
      if (dictionaryToCreate.contains(w)) {
        val c = w.charAt(0).toInt
        if (c < 256) { writeBits(numBits, 0); writeBits(8, c) }
        else { writeBits(numBits, 1); writeBits(16, c) }
        decrementEnlargeIn()
        dictionaryToCreate.remove(w)
      } else writeBits(numBits, dictionary(w))
      decrementEnlargeIn()
    }
    def decrementEnlargeIn(): Unit = {
      enlargeIn -= 1
      if (enlargeIn == 0) { enlargeIn = 1 << numBits; numBits += 1 }
    }

    uncompressed.foreach { ch =>
      val c = ch.toString
      if (!dictionary.contains(c)) {
        dictionary(c) = dictSize; dictSize += 1
        dictionaryToCreate.add(c)
      }
      val wc = w + c
      if (dictionary.contains(wc)) w = wc
      else {
        produceW()
        dictionary(wc) = dictSize; dictSize += 1
        w = c
      }
    }
    if (w.nonEmpty) produceW()
    writeBits(numBits, 2) // end-of-stream
    // flush
    while (true) {
      dataVal <<= 1
      if (dataPosition == bitsPerChar - 1) {
        data.append(getCharFromInt(dataVal))
        return data.toString
      } else dataPosition += 1
    }
    data.toString // unreachable
  }

  private def decompress(length: Int, resetValue: Int, getNextValue: Int => Int): String = {
    val dictionary = mutable.ArrayBuffer[String]("0", "1", "2")
    var enlargeIn = 4
    var dictSize = 4
    var numBits = 3
    var dataVal = getNextValue(0)
    var dataPosition = resetValue
    var dataIndex = 1

    def readBits(n: Int): Int = {
      var bits = 0
      var power = 1
      val maxpower = 1 << n
      while (power != maxpower) {
        val resb = dataVal & dataPosition
        dataPosition >>= 1
        if (dataPosition == 0) {
          dataPosition = resetValue
          dataVal = if (dataIndex < length) getNextValue(dataIndex) else 0
          dataIndex += 1
        }
        if (resb > 0) bits |= power
        power <<= 1
      }
      bits
    }

    val first = readBits(2) match {
      case 0 => readBits(8).toChar.toString
      case 1 => readBits(16).toChar.toString
      case 2 => return ""
      case _ => return null
    }
    dictionary += "" // index 3 placeholder
    dictionary(3) = first
    var w = first
    val result = new StringBuilder(first)

    while (true) {
      if (dataIndex > length) return ""
      var c = readBits(numBits)
      c match {
        case 0 =>
          dictionary += readBits(8).toChar.toString
          c = dictSize; dictSize += 1
          enlargeIn -= 1
        case 1 =>
          dictionary += readBits(16).toChar.toString
          c = dictSize; dictSize += 1
          enlargeIn -= 1
        case 2 => return result.toString
        case _ =>
      }
      if (enlargeIn == 0) { enlargeIn = 1 << numBits; numBits += 1 }
      val entry =
        if (c < dictionary.length) dictionary(c)
        else if (c == dictSize) w + w.charAt(0)
        else return null
      result.append(entry)
      dictionary += w + entry.charAt(0)
      dictSize += 1
      enlargeIn -= 1
      w = entry
      if (enlargeIn == 0) { enlargeIn = 1 << numBits; numBits += 1 }
    }
    result.toString // unreachable
  }
}
