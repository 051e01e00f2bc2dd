package graft.core

import org.scalatest.funsuite.AnyFunSuite

class EngineConfSpec extends AnyFunSuite {

  test("fromPropertiesJson resolves the reference's property groups (main.py:99-136)") {
    val json =
      """[
        | {"PropertyGroupId": "producer.config.0",
        |  "PropertyMap": {"input.topic.name": "in_t", "bootstrap.servers": "b:9092"}},
        | {"PropertyGroupId": "consumer.config.0",
        |  "PropertyMap": {"output.topic.name": "out_t", "output.s3.bucket": "s3://x/y"}}
        |]""".stripMargin
    val c = EngineConf.fromPropertiesJson(json)
    assert(c.inputTopic == "in_t")
    assert(c.outputTopic == "out_t")
    assert(c.outputPath == "s3://x/y")
    assert(c.bootstrapServers == "b:9092")
  }

  test("defaults mirror the reference topology (stack.py:114,118) and query params") {
    val c = EngineConf.default
    assert(c.inputTopic == "kfp_sensor_topic")
    assert(c.outputTopic == "kfp_sns_topic")
    assert(c.watermarkDelay == "5 seconds")
    assert(c.alertWindow == "30 seconds")
    assert(c.avgWindow == "60 seconds")
    assert(c.alertMinCount == 3L)
    assert(c.hotThreshold == 30L)
  }

  test("fromEnv overrides via GRAFT_* variables") {
    val c = EngineConf.fromEnv(Map("GRAFT_INPUT_TOPIC" -> "t2"))
    assert(c.inputTopic == "t2")
    assert(c.outputTopic == EngineConf.default.outputTopic)
  }
}
