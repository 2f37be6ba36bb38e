"""Pure, picklable kernels used inside ``map_batches`` stages."""
