package graft.spark

/** Regenerates the committed MP4 container fixture
  * (src/test/resources/multimodal/sample.mp4 = Multimodal.synthMp4(7));
  * MultimodalSpec pins both the bytes and the parsed box metadata.
  */
object Mp4FixtureGenCli {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "src/test/resources/multimodal/sample.mp4")
    java.nio.file.Files.write(out, graft.ops.Multimodal.synthMp4(7))
    println(s"wrote $out (${java.nio.file.Files.size(out)} bytes)")
  }
}
