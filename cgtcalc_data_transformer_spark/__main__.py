from cgtcalc_data_transformer_spark.cli import main

import sys

sys.exit(main())
