import numpy as np
from mask_yolo_tpu import MaskYOLO
from mask_yolo_tpu.data.shapes import ShapesConfig, ShapesDataset

class YoloConfig(ShapesConfig):
    BATCH_SIZE = 16

cfg = YoloConfig()
tr = ShapesDataset(); tr.load_shapes(400, 224, 224, seed=0); tr.prepare()
va = ShapesDataset(); va.load_shapes(16, 224, 224, seed=1); va.prepare()

m = MaskYOLO(mode="yolo", config=cfg, model_dir="/tmp/yolo_ckpt")
m.train(tr, va, learning_rate=1e-3, epochs=40, layers="all", verbose=True)
m.save_weights("/tmp/yolo_weights")

infer = MaskYOLO(mode="yolo", config=YoloConfig())
infer.load_weights("/tmp/yolo_weights")
ev = ShapesDataset(); ev.load_shapes(4, 224, 224, seed=9); ev.prepare()
total = 0
for iid in ev.image_ids:
    boxes = infer.infer_yolo(ev.load_image(iid), save_path="/tmp/yolo_out/")
    total += len(boxes)
    print("image", iid, "->", [(b["label"], round(b["score"],2)) for b in boxes], flush=True)
print("TOTAL boxes:", total)
print("YOLO MODE OK")
