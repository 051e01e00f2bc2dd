package graft.core

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Runtime configuration for the sensor pipeline.
  *
  * The reference resolves its topics/brokers/bucket from
  * `/etc/flink/application_properties.json`, selecting property groups by
  * `PropertyGroupId` (`PythonKafkaSink/main.py:99-136`; groups declared in
  * `msk_flink_streaming_stack.py:106-121`). We keep the same keys
  * (`input.topic.name`, `output.topic.name`, `output.s3.bucket`,
  * `bootstrap.servers` — `main.py:122-125`) but load from a plain JSON file
  * of `[{"PropertyGroupId":…, "PropertyMap":{…}}]`, env vars, or code.
  */
final case class EngineConf(
    inputTopic: String,
    outputTopic: String,
    outputPath: String,
    bootstrapServers: String,
    checkpointDir: String,
    watermarkDelay: String = "5 seconds", // main.py:18
    alertWindow: String = "30 seconds",   // main.py:85
    avgWindow: String = "60 seconds",     // main.py:96
    alertMinCount: Long = 3L,             // main.py:86 (strict >)
    hotThreshold: Long = 30L              // main.py:84
)

object EngineConf {
  /** Producer/consumer group ids used by the reference (`main.py:139-140`,
    * `stack.py:106-121`).
    */
  val ProducerGroup = "producer.config.0"
  val ConsumerGroup = "consumer.config.0"

  def default: EngineConf = EngineConf(
    inputTopic = "kfp_sensor_topic",  // stack.py:114
    outputTopic = "kfp_sns_topic",    // stack.py:118
    outputPath = "/tmp/graft/out",
    bootstrapServers = "localhost:9092",
    checkpointDir = "/tmp/graft/chk"
  )

  /** Parse the reference's property-group JSON shape (`main.py:99-115`). */
  def fromPropertiesJson(json: String): EngineConf = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    val groups = root.elements().asScala.map { g =>
      g.get("PropertyGroupId").asText() ->
        g.get("PropertyMap").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap
    }.toMap
    val producer = groups.getOrElse(ProducerGroup, Map.empty)
    val consumer = groups.getOrElse(ConsumerGroup, Map.empty)
    val base = default
    base.copy(
      inputTopic = producer.getOrElse("input.topic.name", base.inputTopic),
      outputTopic = consumer.getOrElse("output.topic.name", base.outputTopic),
      outputPath = consumer.getOrElse("output.s3.bucket", base.outputPath),
      bootstrapServers = producer.getOrElse("bootstrap.servers", base.bootstrapServers)
    )
  }

  def fromEnv(env: Map[String, String] = sys.env): EngineConf = {
    val base = default
    base.copy(
      inputTopic = env.getOrElse("GRAFT_INPUT_TOPIC", base.inputTopic),
      outputTopic = env.getOrElse("GRAFT_OUTPUT_TOPIC", base.outputTopic),
      outputPath = env.getOrElse("GRAFT_OUTPUT_PATH", base.outputPath),
      bootstrapServers = env.getOrElse("GRAFT_BOOTSTRAP_SERVERS", base.bootstrapServers),
      checkpointDir = env.getOrElse("GRAFT_CHECKPOINT_DIR", base.checkpointDir)
    )
  }
}
