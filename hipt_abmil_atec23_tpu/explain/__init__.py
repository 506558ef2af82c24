"""Explainability: attention heatmaps (MIL + ViT levels), ROI sampling."""
