from .bigru_pallas import bigru_layer_pallas, birnn_apply_pallas

__all__ = ["bigru_layer_pallas", "birnn_apply_pallas"]
