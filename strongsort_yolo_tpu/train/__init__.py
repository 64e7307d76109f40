"""Training: detection loss (TAL assigner, CIoU + BCE + DFL) and the
sharded train step. The reference has no training path (it consumes
pretrained ultralytics checkpoints, SURVEY.md D1); a complete framework
must be able to produce those weights, and the multi-chip scaling story
(parallel/) is exercised through the training step."""
