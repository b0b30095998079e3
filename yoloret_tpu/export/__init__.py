from yoloret_tpu.export.export import export_model, export_stablehlo

__all__ = ["export_model", "export_stablehlo"]
