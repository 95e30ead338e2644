from ibgs_tpu.parallel.sharding import make_mesh, sharded_render, sharded_train_step
