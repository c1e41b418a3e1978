from .decode import ImageFeatureStage, AudioFeatureStage, multimodal_schema

__all__ = ["ImageFeatureStage", "AudioFeatureStage", "multimodal_schema"]
