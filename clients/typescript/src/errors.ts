/**
 * Typed error hierarchy (reference: clients/typescript/src/errors.ts —
 * status-code-mapped error classes so callers can `instanceof` on the
 * contract-guaranteed conflicts/not-founds).
 */

export class KektorDBError extends Error {
  constructor(
    public status: number,
    message: string,
    public body?: unknown,
  ) {
    super(`HTTP ${status}: ${message}`);
    this.name = "KektorDBError";
  }
}

/** 400 — malformed request (wrong dim, bad filter, self-link, ...). */
export class ValidationError extends KektorDBError {
  constructor(message: string, body?: unknown) {
    super(400, message, body);
    this.name = "ValidationError";
  }
}

/** 401/403 — missing or insufficient credentials. */
export class AuthError extends KektorDBError {
  constructor(status: number, message: string, body?: unknown) {
    super(status, message, body);
    this.name = "AuthError";
  }
}

/** 404 — index / vector / key / session does not exist. */
export class NotFoundError extends KektorDBError {
  constructor(message: string, body?: unknown) {
    super(404, message, body);
    this.name = "NotFoundError";
  }
}

/** 409 — duplicate index or duplicate vector id (contracts.json). */
export class ConflictError extends KektorDBError {
  constructor(message: string, body?: unknown) {
    super(409, message, body);
    this.name = "ConflictError";
  }
}

/** 5xx — server-side failure. */
export class ServerError extends KektorDBError {
  constructor(status: number, message: string, body?: unknown) {
    super(status, message, body);
    this.name = "ServerError";
  }
}

/** Map a response status to the matching typed error. */
export function errorForStatus(
  status: number,
  message: string,
  body?: unknown,
): KektorDBError {
  if (status === 400) return new ValidationError(message, body);
  if (status === 401 || status === 403) return new AuthError(status, message, body);
  if (status === 404) return new NotFoundError(message, body);
  if (status === 409) return new ConflictError(message, body);
  if (status >= 500) return new ServerError(status, message, body);
  return new KektorDBError(status, message, body);
}
