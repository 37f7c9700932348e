package graft

/** Standalone server entry — the deployment shape the reference ships
  * (gRPC endpoint + web front end over one entity store): starts the
  * JSON/HTTP front door (browser console at `/`) and the gRPC endpoint
  * over a shared entity base directory.
  *
  * Usage: `runMain graft.Serve [baseDir] [httpPort] [grpcPort]`
  * (ports default 8090/8091; 0 = ephemeral, printed on startup).
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/tmp/graft-data"
    val httpPort = if (args.length > 1) args(1).toInt else 8090
    val grpcPort = if (args.length > 2) args(2).toInt else 8091
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(base).mkdirs()
    val http = graft.api.Server.start(spark, base, httpPort)
    val grpc = new graft.grpc.GraftGrpcServer(spark, base).startNetty(grpcPort)
    println(s"[serve] console http://127.0.0.1:${http.port}/" +
      s"  grpc 127.0.0.1:${grpc.getPort}  base $base")
    sys.addShutdownHook { http.stop(); grpc.shutdown() }
    grpc.awaitTermination()
  }
}
