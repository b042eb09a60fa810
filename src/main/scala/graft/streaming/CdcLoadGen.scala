package graft.streaming

import java.io.ByteArrayOutputStream
import graft.sources.ConfluentAvro
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory

/** Deterministic Confluent-framed Debezium envelope generator for the
  * streaming bench (`stream_events_per_sec`) and load experiments: the
  * same byte layout the reference's batcher consumes off Kafka
  * (serializer.go framing, magic byte + 4-byte schema id + Avro binary),
  * produced without a broker so the decode → transform → merge path can
  * be driven through MemoryStream micro-batches at volume.
  *
  * Two schema versions are published: [[schemaV2]] adds a column over
  * [[schemaV1]], so a generated run can include the schema-change flush
  * (T3/D4: the add-column migration forces the merge rewrite instead of
  * the skipMerge append).
  */
object CdcLoadGen {

  private def envelopeJson(extraField: String): String =
    s"""{"type": "record", "name": "Envelope",
       |"namespace": "bench.stream.users",
       |"fields": [
       |  {"name": "before", "type": ["null", {
       |    "type": "record", "name": "Value", "fields": [
       |      {"name": "id", "type": {"type": "int", "connect.parameters":
       |        {"__debezium.source.column.type": "INT",
       |         "__debezium.source.column.length": "11"}}},
       |      {"name": "name", "type": ["null", {"type": "string",
       |        "connect.parameters":
       |        {"__debezium.source.column.type": "VARCHAR",
       |         "__debezium.source.column.length": "255"}}], "default": null},
       |      {"name": "v", "type": ["null", {"type": "long",
       |        "connect.parameters":
       |        {"__debezium.source.column.type": "BIGINT"}}], "default": null}$extraField
       |  ]}], "default": null},
       |  {"name": "after", "type": ["null", "Value"], "default": null},
       |  {"name": "op", "type": ["null", "string"], "default": null},
       |  {"name": "ts_ms", "type": ["null", "long"], "default": null}
       |]}""".stripMargin

  val schemaV1: String = envelopeJson("")
  val schemaV2: String = envelopeJson(
    """,
      |      {"name": "extra", "type": ["null", {"type": "string",
      |        "connect.parameters":
      |        {"__debezium.source.column.type": "VARCHAR",
      |         "__debezium.source.column.length": "64"}}], "default": null}"""
      .stripMargin)

  private val parsedV1 = new Schema.Parser().parse(schemaV1)
  private val parsedV2 = new Schema.Parser().parse(schemaV2)

  private def parsed(schemaId: Int): Schema =
    if (schemaId == 2) parsedV2 else parsedV1

  private def valueRecord(schema: Schema, id: Int, withExtra: Boolean): GenericRecord = {
    val valueSchema = schema.getField("before").schema().getTypes.get(1)
    val r = new GenericData.Record(valueSchema)
    r.put("id", id)
    r.put("name", s"user_$id")
    r.put("v", id.toLong * 7L)
    if (withExtra && valueSchema.getField("extra") != null)
      r.put("extra", s"x$id")
    r
  }

  /** One framed event. `op` is the Debezium op class: "c" (before absent),
    * "u" (both sides), "d" (after absent). */
  def frame(schemaId: Int, op: String, id: Int): Array[Byte] = {
    val sc = parsed(schemaId)
    val withExtra = schemaId == 2
    val env = new GenericData.Record(sc)
    if (op != "c") env.put("before", valueRecord(sc, id, withExtra))
    if (op != "d") env.put("after", valueRecord(sc, id, withExtra))
    env.put("op", op)
    env.put("ts_ms", 1700000000000L + id)
    val out = new ByteArrayOutputStream()
    out.write(ConfluentAvro.MagicByte)
    out.write(Array[Byte](
      (schemaId >> 24).toByte, (schemaId >> 16).toByte,
      (schemaId >> 8).toByte, schemaId.toByte))
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](sc).write(env, encoder)
    encoder.flush()
    out.toByteArray
  }

  /** A deterministic micro-batch: mostly creates of fresh ids, plus
    * updates and deletes against ids the PREVIOUS batch actually
    * created — the C/U/D mix the merge path has to dedupe and
    * reconcile. Within every block of 20 positions, 16 are creates
    * (positions 0–15), 3 updates (16–18) and 1 delete (19); the
    * update/delete targets are `i - 4` positions back in the previous
    * batch, which always lands on a create position (12–15 mod 20), so
    * every update exercises in-place SCD-1 overwrite and every delete
    * the delete-common path — never a phantom id that silently degrades
    * the workload to append-only. Offsets are globally monotone,
    * mirroring a Kafka partition's sequence.
    *
    * CONTRACT: every batch of one generated stream must use the SAME
    * `perBatch` — the update/delete targets are derived as
    * `(batchIdx - 1) * perBatch + i - 4`, i.e. positions in the previous
    * batch under the same width. A caller varying `perBatch` across
    * batches gets phantom ids and the workload silently degrades to
    * append-only (the failure mode this generator exists to avoid). For
    * variable-width or hot-key streams use [[zipfBatch]], whose id choice
    * is batch-width-independent. */
  def batch(batchIdx: Int, perBatch: Int, schemaId: Int): Seq[(Long, Array[Byte])] = {
    val base = batchIdx * perBatch
    val prevBase = (batchIdx - 1) * perBatch
    (0 until perBatch).map { i =>
      val off = (base + i).toLong
      val ev =
        if (batchIdx > 0 && i % 20 == 19) // 5% deletes of prior creates
          frame(schemaId, "d", prevBase + i - 4)
        else if (batchIdx > 0 && i % 20 >= 16) // 15% updates of prior creates
          frame(schemaId, "u", prevBase + i - 4)
        else // 80% creates of fresh ids
          frame(schemaId, "c", base + i)
      (off, ev)
    }
  }

  // splitmix64 finalizer — the same deterministic mixing the engine's
  // hash-based samplers rely on; no RNG state, so any (batchIdx, i)
  // reproduces its event bit-for-bit
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-universe inverse-CDF table for zipf(s) over [0, universe):
    * weight(k) = 1/(k+1)^s. Driver-side and tiny (one double per id);
    * memoized because the bench calls zipfBatch per batch. */
  private val zipfCdfCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Double), Array[Double]]()
  private def zipfCdf(universe: Int, s: Double): Array[Double] =
    zipfCdfCache.computeIfAbsent((universe, s), { _ =>
      val w = Array.tabulate(universe)(k => math.pow(k + 1.0, -s))
      val total = w.sum
      val cdf = new Array[Double](universe)
      var acc = 0.0
      var k = 0
      while (k < universe) { acc += w(k) / total; cdf(k) = acc; k += 1 }
      cdf(universe - 1) = 1.0 // guard against float residue
      cdf
    })

  /** Skewed micro-batch: event ids drawn zipf(s) from a FIXED universe
    * `[0, universe)` — the hot-row shape real CDC exhibits (a busy
    * account row updated thousands of times while the long tail is
    * touched once). Id 0 is the hottest; at s=1.2, universe=20k the top
    * id takes ~8% of all events, so the merge path's PK window (R1
    * dedupe) and delete-common join see genuine key skew — the probe the
    * uniform [[batch]] cannot provide.
    *
    * Ops are position-derived like [[batch]] (80/15/5 C/U/D), but ids
    * repeat within and across batches by construction, so the dedupe
    * stage does real last-writer-wins work. Batch-width independent:
    * ids depend only on the global event ordinal, so any perBatch
    * slicing of the same stream yields the same id sequence. */
  def zipfBatch(batchIdx: Int, perBatch: Int, universe: Int,
      s: Double = 1.2, schemaId: Int = 1): Seq[(Long, Array[Byte])] = {
    val cdf = zipfCdf(universe, s)
    val base = batchIdx.toLong * perBatch
    (0 until perBatch).map { i =>
      val off = base + i
      // uniform in [0, 1) from the global ordinal — id choice survives
      // re-slicing the stream into different batch widths
      val u = (mix64(off) >>> 11).toDouble / (1L << 53).toDouble
      val idx = java.util.Arrays.binarySearch(cdf, u)
      val id = if (idx >= 0) idx else -idx - 1
      val op =
        if (i % 20 == 19) "d"
        else if (i % 20 >= 16) "u"
        else "c"
      (off, frame(schemaId, op, id))
    }
  }
}
