from .losses import (cross_entropy_loss, negative_learning_loss,
                     local_discrepancy, semantic_boundary,
                     local_consistent_loss)
