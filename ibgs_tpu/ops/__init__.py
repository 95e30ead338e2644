from ibgs_tpu.ops.rasterize import RasterConfig, SourceViews, rasterize
