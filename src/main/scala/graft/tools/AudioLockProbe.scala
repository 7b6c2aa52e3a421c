package graft.tools

/** Dev probe (r16): isolate the per-clip cost of the WAV decode entry
  * point. `AudioSystem.getAudioInputStream` routes every call through
  * `JDK13Services.getProviders`, which is a class-global SYNCHRONIZED
  * re-scan of the ServiceLoader registry — a candidate explanation for
  * q_media_audio's wall time (trivial 256-sample clips, yet ~1.9 s for
  * 5 000 docs on 32 cores: if the registry lock serializes the lookup,
  * core count is irrelevant). Times N decodes single-threaded vs 8
  * threads, plus the same decodes with the provider lookup hoisted out
  * (header parse + raw PCM read). No Spark involved.
  * Usage: runMain graft.tools.AudioLockProbe [nPerThread] */
object AudioLockProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000
    val w = graft.multimodal.Multimodal.renderWav(42L)
    def decodeJavax(): Unit = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(w))
      ais.readAllBytes(); ()
    }
    (1 to 200).foreach(_ => decodeJavax()) // warm
    var t0 = System.nanoTime()
    (1 to n).foreach(_ => decodeJavax())
    println(f"javax single-thread $n decodes: ${(System.nanoTime - t0) / 1e9}%.3f s")
    t0 = System.nanoTime()
    val ths = (1 to 8).map(_ => new Thread(() =>
      (1 to n).foreach(_ => decodeJavax())))
    ths.foreach(_.start()); ths.foreach(_.join())
    println(f"javax 8 threads x $n decodes: ${(System.nanoTime - t0) / 1e9}%.3f s")

    // provider hoisted once per thread (public SPI + ServiceLoader —
    // the SAME JDK WaveFileReader instance AudioSystem routes to, minus
    // the synchronized per-call registry re-scan)
    def hoistedReader(): javax.sound.sampled.spi.AudioFileReader = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator().asScala
        .find { r =>
          try { r.getAudioInputStream(
            new java.io.ByteArrayInputStream(w)).readAllBytes(); true }
          catch { case _: Exception => false }
        }.getOrElse(sys.error("no WAVE-capable AudioFileReader installed"))
    }
    def decodeHoisted(r: javax.sound.sampled.spi.AudioFileReader): Unit = {
      r.getAudioInputStream(new java.io.ByteArrayInputStream(w))
        .readAllBytes(); ()
    }
    val r0 = hoistedReader()
    (1 to 200).foreach(_ => decodeHoisted(r0))
    t0 = System.nanoTime()
    (1 to n).foreach(_ => decodeHoisted(r0))
    println(f"hoisted single-thread $n decodes: ${(System.nanoTime - t0) / 1e9}%.3f s")
    t0 = System.nanoTime()
    val ths2 = (1 to 8).map(_ => new Thread(() => {
      val r = hoistedReader()
      (1 to n).foreach(_ => decodeHoisted(r))
    }))
    ths2.foreach(_.start()); ths2.foreach(_.join())
    println(f"hoisted 8 threads x $n decodes: ${(System.nanoTime - t0) / 1e9}%.3f s")
  }
}
