from .segment import clean_mask, predict_movie_thres, predict_movie, LABEL_MAPS
from .pipeline import process_video, compute_clip_flow

__all__ = ["clean_mask", "predict_movie_thres", "predict_movie", "LABEL_MAPS",
           "process_video", "compute_clip_flow"]
