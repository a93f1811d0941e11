from cvd_tpu.ops.attention import attention_with_bias
