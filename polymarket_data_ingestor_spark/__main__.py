from polymarket_data_ingestor_spark.cli import main

raise SystemExit(main())
