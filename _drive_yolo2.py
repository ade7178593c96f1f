from mask_yolo_tpu import MaskYOLO
from mask_yolo_tpu.data.shapes import ShapesConfig, ShapesDataset

class YoloConfig(ShapesConfig):
    BATCH_SIZE = 16
    OBJ_THRESHOLD = 0.10

infer = MaskYOLO(mode="yolo", config=YoloConfig())
infer.load_weights("/tmp/yolo_weights")
ev = ShapesDataset(); ev.load_shapes(4, 224, 224, seed=9); ev.prepare()
for iid in ev.image_ids:
    boxes = infer.infer_yolo(ev.load_image(iid), save_path="/tmp/yolo_out/")
    print("image", iid, "->", [(b["label"], round(b["score"],2)) for b in boxes], flush=True)
print("OK")
