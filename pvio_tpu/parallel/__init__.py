from pvio_tpu.parallel import sharded_ba
