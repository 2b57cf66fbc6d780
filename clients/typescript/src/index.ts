export { KektorDBClient, Task } from "./client";
export {
  KektorDBError,
  ValidationError,
  AuthError,
  NotFoundError,
  ConflictError,
  ServerError,
  errorForStatus,
} from "./errors";
export {
  CognitiveSession,
  ContextAssembler,
  MultiAgentCoordinator,
} from "./cognitive";
export type {
  SearchHit,
  SearchResponse,
  SearchOptions,
  CreateIndexOptions,
  IndexInfo,
  VectorItem,
  EdgeInfo,
  IncomingEdgeInfo,
  GraphFilter,
  MemoryConfig,
  LayerConfig,
  SubgraphResponse,
  BeliefState,
  TaskStatus,
  ApiKeyInfo,
  SystemStats,
} from "./types";
