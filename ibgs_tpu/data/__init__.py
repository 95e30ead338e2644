from ibgs_tpu.data.dataset import SceneData, load_scene
