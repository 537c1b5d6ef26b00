from .images import (REGION, synth_images_df, synth_images_pandas,
                     synth_edges_pandas, synth_edges_df,
                     synth_zones_pandas, synth_zones_df)

__all__ = ["REGION", "synth_images_df", "synth_images_pandas",
           "synth_edges_pandas", "synth_edges_df",
           "synth_zones_pandas", "synth_zones_df"]
