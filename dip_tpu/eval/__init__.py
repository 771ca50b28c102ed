from dip_tpu.eval.sr_eval import eval_sr_dataset, psnr_y_bbox_protocol

__all__ = ["eval_sr_dataset", "psnr_y_bbox_protocol"]
