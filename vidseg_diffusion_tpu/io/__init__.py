"""IO: checkpoint conversion/loading, frame/video IO."""
